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
