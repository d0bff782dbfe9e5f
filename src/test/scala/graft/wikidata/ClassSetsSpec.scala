package graft.wikidata

import org.scalatest.funsuite.AnyFunSuite

class ClassSetsSpec extends AnyFunSuite {

  test("parses SPARQL results JSON into the trailing-segment Q-id set") {
    val json =
      """{"head":{"vars":["s"]},"results":{"bindings":[
        |{"s":{"type":"uri","value":"http://www.wikidata.org/entity/Q515"}},
        |{"s":{"type":"uri","value":"http://www.wikidata.org/entity/Q1549591"}},
        |{"s":{"type":"uri","value":"http://www.wikidata.org/entity/Q486972"}}
        |]}}""".stripMargin
    assert(ClassSets.fromSparqlResultsJson(json) ==
      Set("Q515", "Q1549591", "Q486972"))
  }

  test("live SPARQL fetch: one closure query per seed, seeds self-included") {
    // serve canned sparql-results+json from a local endpoint
    // (wiki_sparql.rs:9-67 flow, without the network)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val queries = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    server.createContext("/sparql", ex => {
      val q = java.net.URLDecoder.decode(
        ex.getRequestURI.getRawQuery.stripPrefix("query="), "UTF-8")
      queries.add(q)
      // Q56061 has one subclass; everything else is empty
      val bindings =
        if (q.contains("wd:Q56061"))
          """{"s":{"type":"uri","value":"http://www.wikidata.org/entity/Q515"}}"""
        else ""
      val body =
        s"""{"head":{"vars":["s"]},"results":{"bindings":[$bindings]}}"""
          .getBytes("UTF-8")
      assert(ex.getRequestHeaders.getFirst("Accept")
        .startsWith("application/sparql-results+json"))
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val cs = ClassSets.fromSparql(
        s"http://127.0.0.1:${server.getAddress.getPort}/sparql")
      assert(cs.territorialEntities == Set("Q56061", "Q515"))
      assert(cs.humanSettlements == Set("Q486972"))
      assert(cs.excluded == ClassSets.excludedSeeds)
      assert(cs.excludedSettlements == ClassSets.excludedSettlementSeeds)
      // one P279+ closure query per seed: 1+1+5+4+1+1
      assert(queries.size == 13)
      assert(queries.stream().allMatch(_.contains("wdt:P279+")))
    } finally server.stop(0)
  }

  test("closure file loader groups by set name with seeded defaults") {
    val f = java.io.File.createTempFile("closure", ".tsv")
    java.nio.file.Files.writeString(f.toPath,
      "te\tQ56061\nte\tQ515\nhs\tQ486972\n")
    val cs = ClassSets.fromClosureFile(f.getAbsolutePath)
    assert(cs.territorialEntities == Set("Q56061", "Q515"))
    assert(cs.humanSettlements == Set("Q486972"))
    assert(cs.excluded == ClassSets.excludedSeeds) // default when absent
    f.delete()
  }
}
