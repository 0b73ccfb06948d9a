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

  test("docs/CATALOG.md matches the catalog (regen: runMain graft.CatalogIndex)") {
    val p = Paths.get("docs/CATALOG.md")
    assert(Files.exists(p), "docs/CATALOG.md missing — run: sbt \"runMain graft.CatalogIndex\"")
    assert(Files.readString(p) == CatalogIndex.render(),
      "docs/CATALOG.md is stale — run: sbt \"runMain graft.CatalogIndex\"")
  }
}
