package graft

import java.nio.file.{Files, Paths}

import graft.pipelines.Clean
import graft.sources.HttpIngest

/** S5 exchange-rate JSON source and P10 config cross-product frontier. */
class FxFrontierSpec extends SparkTestBase {

  test("loadFx parses the reference's rates-map JSON shape") {
    val dir = Files.createDirectories(
      java.nio.file.Paths.get("target/tmp/graft_fx"))
    val path = dir.resolve("fx_rates.json")
    Files.writeString(path,
      """{"rates": {"USD": 1.0, "GBP": 0.72, "COP": 3900.0}}""")
    val fx = Clean.loadFx(spark, path.toString)
    assert(fx == Map("USD" -> 1.0, "GBP" -> 0.72, "COP" -> 3900.0))
  }

  test("frontier expands terms x locations into formatted URLs") {
    val tasks = HttpIngest.frontier(spark,
      "http://t/%s-jobs-%s.htm",
      Seq("data engineer", "ml engineer"),
      Map("london" -> "L1", "paris" -> "P2"))
      .collect().sortBy(t => (t.term, t.location))
    assert(tasks.length == 4)
    assert(tasks.head.baseUrl == "http://t/data engineer-jobs-L1.htm" ||
      tasks.exists(_.baseUrl == "http://t/data engineer-jobs-L1.htm"))
    assert(tasks.map(_.location).toSet == Set("london", "paris"))
  }
}
