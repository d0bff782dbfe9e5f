package graft.wikidata

/** The six Q-id class sets driving entity classification
  * (/root/reference/src/wiki_sparql.rs:69-131).
  *
  * The reference expands each seed to its transitive subclass closure
  * server-side (SPARQL `wdt:P279+`, wiki_sparql.rs:34-43). In this engine the
  * closure is an input: load a precomputed closure file (one `<setName>
  * <TAB> <Qid>` per line) or pass explicit sets (tests use small fixture
  * worlds). The sets are small (≤ a few hundred k ids) and read-only, so they
  * travel to executors as broadcast variables, never as a join side.
  *
  * Note `secondLevelAdminDiv` is actually FIRST-level subdivisions — the
  * field name is the reference's own misnomer, kept for traceability
  * (wiki_sparql.rs:115-116).
  */
final case class ClassSets(
    territorialEntities: Set[String],
    humanSettlements: Set[String],
    excluded: Set[String],
    excludedSettlements: Set[String],
    secondLevelAdminDiv: Set[String],
    languages: Set[String])

object ClassSets {
  /** Seed classes (expanded to subclass closures upstream). */
  val territorialEntitySeed = "Q56061"
  val humanSettlementSeed = "Q486972"
  val excludedSeeds: Set[String] =
    Set("Q2974842", "Q123705", "Q131596", "Q40357", "Q695850")
  val excludedSettlementSeeds: Set[String] =
    Set("Q941150", "Q159313", "Q106505045", "Q22969563")
  val secondLevelAdminDivSeed = "Q10864048"
  val languageSeed = "Q34770"

  /** Closure file: lines of `set<TAB>Qid` with set in
    * {te, hs, excluded, excluded_hs, second, lang}. */
  def fromClosureFile(path: String): ClassSets = {
    val lines = scala.io.Source.fromFile(path).getLines()
      .filter(_.nonEmpty).map { l =>
        val Array(k, v) = l.split("\t", 2); (k, v)
      }.toSeq
    val m = lines.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    ClassSets(
      m.getOrElse("te", Set(territorialEntitySeed)),
      m.getOrElse("hs", Set(humanSettlementSeed)),
      m.getOrElse("excluded", excludedSeeds),
      m.getOrElse("excluded_hs", excludedSettlementSeeds),
      m.getOrElse("second", Set(secondLevelAdminDivSeed)),
      m.getOrElse("lang", Set(languageSeed)))
  }

  /** Seeds only — the minimal sets when no closure dump is supplied. */
  def seedsOnly: ClassSets = ClassSets(
    Set(territorialEntitySeed), Set(humanSettlementSeed),
    excludedSeeds, excludedSettlementSeeds,
    Set(secondLevelAdminDivSeed), Set(languageSeed))

  /** Live SPARQL closure fetch (wiki_sparql.rs:9-67): one GET per seed to a
    * SPARQL endpoint — `SELECT ?s WHERE { ?s wdt:P279+ wd:<seed> . }`, the
    * transitive subclass closure computed server-side — parsed by
    * [[fromSparqlResultsJson]]. Driver-side utility, not a query-engine
    * operator: the six sets are fetched once at job start and broadcast.
    * Prefer [[fromClosureFile]] operationally (a closure snapshot is
    * reproducible; the live graph changes daily) — this exists so the
    * reference's front-to-back flow works without extra tooling. */
  def fetchSubclasses(endpoint: String, seed: String,
      userAgent: String = "graft geo-db",
      timeoutMs: Int = 120000): Set[String] = {
    val q = java.net.URLEncoder.encode(
      s"SELECT ?s WHERE { ?s wdt:P279+ wd:$seed . }", "UTF-8")
    val c = java.net.URI.create(s"$endpoint?query=$q").toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    c.setConnectTimeout(timeoutMs)
    c.setReadTimeout(timeoutMs)
    c.setRequestProperty("User-Agent", userAgent)
    c.setRequestProperty("Accept", "application/sparql-results+json;charset=utf-8")
    val code = c.getResponseCode
    if (code != 200) {
      c.disconnect()
      throw new java.io.IOException(s"SPARQL endpoint returned HTTP $code")
    }
    val in = c.getInputStream
    try fromSparqlResultsJson(
      new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  /** The six sets from a live endpoint — new_from_http
    * (wiki_sparql.rs:78-131): every seed is expanded AND included itself. */
  def fromSparql(endpoint: String): ClassSets = {
    def closure(seeds: Set[String]): Set[String] =
      seeds ++ seeds.flatMap(fetchSubclasses(endpoint, _))
    ClassSets(
      closure(Set(territorialEntitySeed)),
      closure(Set(humanSettlementSeed)),
      closure(excludedSeeds),
      closure(excludedSettlementSeeds),
      closure(Set(secondLevelAdminDivSeed)),
      closure(Set(languageSeed)))
  }

  /** Parse a `application/sparql-results+json` document (the reference's
    * closure source, wiki_sparql.rs:34-67: the `?s` binding of
    * `SELECT ?s WHERE { ?s wdt:P279+ wd:<seed> }`) into the Q-id set —
    * the trailing path segment of each result URI. Run the SPARQL queries
    * offline (one per seed), save the JSON responses, and load them here. */
  def fromSparqlResultsJson(json: String): Set[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val bindings = root.path("results").path("bindings")
    val out = Set.newBuilder[String]
    val it = bindings.elements()
    while (it.hasNext) {
      val uri = it.next().path("s").path("value").asText("")
      if (uri.nonEmpty) out += uri.substring(uri.lastIndexOf('/') + 1)
    }
    out.result()
  }
}
