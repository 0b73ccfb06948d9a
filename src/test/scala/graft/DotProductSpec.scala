package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.DotProduct

/** The native dot-product expressions must agree with the higher-order
  * fold they replaced — on values (bit-exact doubles), on null/length
  * edge cases, and on BOTH execution paths (whole-stage codegen and the
  * interpreted eval fallback). */
class DotProductSpec extends SparkTestBase {
  import spark.implicits._

  private def hofDotDouble(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private val vecs = Seq(
    (Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.25f)),
    (Array(0.1f, 0.2f, 0.3f), Array(0.4f, 0.5f, 0.6f)))

  test("double dot is bit-identical to the HOF left fold") {
    val df = vecs.toDF("a", "b").select(
      DotProduct.dotDouble($"a", $"b").as("native"),
      hofDotDouble($"a", $"b").as("hof"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("codegen and interpreted eval agree") {
    val codegenOff = spark.newSession()
    codegenOff.conf.set("spark.sql.codegen.wholeStage", "false")
    codegenOff.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    def run(s: org.apache.spark.sql.SparkSession): Seq[(Long, Double)] = {
      import s.implicits._
      Seq((Seq(3L, -4L, 5L), Seq(2L, 10L, 7L)))
        .toDF("a", "b")
        .select(DotProduct.dotLong($"a", $"b"),
          DotProduct.dotDouble($"a".cast("array<double>"),
            $"b".cast("array<double>")))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    assert(run(spark) == run(codegenOff))
    assert(run(spark) == Seq((1L, 1.0))) // 6 - 40 + 35
  }

  test("length mismatch and null elements yield NULL (HOF semantics)") {
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L)),
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](3L, 4L)))
      .toDF("a", "b")
      .select(DotProduct.dotLong($"a", $"b").as("d"))
    assert(df.collect().toSeq == Seq(Row(null), Row(null)))
  }

  test("stays inside WholeStageCodegen (no interpreter fallback)") {
    // Over a real scan — a local Seq collapses to an eagerly-evaluated
    // LocalTableScan with no codegen stage to inspect.
    val df = graft.core.Tables.embeddings(spark, Sf0001)
      .select(DotProduct.dotDouble(
        $"embedding".cast("array<double>"),
        $"embedding".cast("array<double>")).as("n2"))
    val codegenStages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
          if w.toString.contains("array_dot_double") => w
    }
    assert(codegenStages.nonEmpty,
      s"expected the dot inside a codegen span:\n" +
        df.queryExecution.executedPlan)
    assert(df.count() > 0)
  }
}
