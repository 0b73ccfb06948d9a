package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Pins `docs/CATALOG.md` (the public API index) to the live catalog:
  * every query documented, no stale entries, committed markdown equal to
  * the renderer's output. No Spark session needed — this is a pure
  * map/string check. */
class CatalogIndexSpec extends AnyFunSuite {

  test("every catalog query has exactly one description") {
    val queries = SparkEntry.queries.keySet
    val documented = CatalogIndex.descriptions.keySet
    val missing = queries -- documented
    val stale = documented -- queries
    assert(missing.isEmpty, s"undocumented queries: ${missing.toSeq.sorted}")
    assert(stale.isEmpty, s"descriptions for removed queries: ${stale.toSeq.sorted}")
  }

  test("grouped query names cover the catalog exactly once") {
    val grouped = SparkEntry.groupedQueries.flatMap(_._2)
    assert(grouped.size == grouped.distinct.size, "query in two groups")
    assert(grouped.toSet == SparkEntry.queries.keySet)
  }

  test("README inventory counts match the live catalog and test surface") {
    import scala.jdk.CollectionConverters._
    // Discover every suite from the filesystem (a new XSpec.scala file is
    // picked up by name — no hand-maintained list to drift), then ask
    // scalatest itself for the registered test count: suites like
    // SmokeSpec register one test per catalog query in a loop, so static
    // grep-counting undercounts.
    val root = Paths.get("src/test/scala/graft")
    val suiteNames = Files.walk(root).iterator().asScala
      .filter(_.getFileName.toString.endsWith("Spec.scala"))
      .map { p =>
        val rel = root.relativize(p).toString.stripSuffix(".scala")
        "graft." + rel.replace(java.io.File.separatorChar, '.')
      }.toSeq.sorted
    val suites = suiteNames.map { n =>
      Class.forName(n).getDeclaredConstructor().newInstance()
        .asInstanceOf[org.scalatest.Suite]
    }
    val nSuites = suites.size
    val nTests = suites.map(_.expectedTestCount(org.scalatest.Filter.default)).sum
    val nQueries = SparkEntry.queries.size
    val readme = Files.readString(Paths.get("README.md"))

    // Every "<n>-query", "<n> suites", "<n> tests" mention in the README
    // must equal the live number — the front page cannot drift the way
    // r11's hand-maintained counts did (README said 43/397, actual 46/414).
    def pin(pattern: String, expected: Int, what: String): Unit = {
      val m = pattern.r.findAllMatchIn(readme).map(_.group(1).toInt).toSeq
      assert(m.nonEmpty, s"README no longer mentions the $what count")
      m.foreach(v => assert(v == expected,
        s"README says $v $what, actual is $expected — update README.md"))
    }
    pin("""(\d+)-query""", nQueries, "query")
    pin("""(\d+) suites""", nSuites, "suites")
    pin("""(\d+) tests""", nTests, "tests")
  }

  test("docs/CATALOG.md matches the catalog (regen: runMain graft.CatalogIndex)") {
    val p = Paths.get("docs/CATALOG.md")
    assert(Files.exists(p), "docs/CATALOG.md missing — run: sbt \"runMain graft.CatalogIndex\"")
    assert(Files.readString(p) == CatalogIndex.render(),
      "docs/CATALOG.md is stale — run: sbt \"runMain graft.CatalogIndex\"")
  }
}
