package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class DotProductSpec extends SparkSuite {

  private def foldSql(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)")

  test("bit-identical to the composable aggregate(zip_with) fold on the real corpus") {
    DotProduct.register(spark)
    val vs = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val diff = vs.as("a").crossJoin(vs.as("b")).limit(2000)
      .withColumn("fused", expr("graft_dot(a.v, b.v)"))
      .withColumn("folded", foldSql("a.v", "b.v"))
      .filter(col("fused") =!= col("folded")) // exact double equality
      .count()
    assert(diff === 0)
  }

  test("interpreted eval path matches codegen (null arrays, null elements, length mismatch)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    DotProduct.register(spark)
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true)),
      StructField("b", ArrayType(DoubleType, containsNull = true))))
    val rows = Seq(
      Row(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),   // 32.0
      Row(Seq(1.0, null, 3.0), Seq(4.0, 5.0, 6.0)),  // null element skipped: 4+18=22
      Row(null, Seq(1.0)),                            // null array → null
      Row(Seq(1.0, 2.0), Seq(3.0)))                   // length mismatch → fold stops: 3.0
    val df = spark.createDataFrame(rows.asJava, schema)
    def run(): Seq[Any] = df.select(expr("graft_dot(a, b)").as("d")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    val got = run() // codegen path (default)
    assert(got === Seq(32.0, 22.0, null, 3.0))
    val old = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() === got) // interpreted path must agree
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", old)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("GraftExtensions injector applies cleanly and its builder produces a working expression") {
    // We can't build a second SparkSession in this JVM; verify the
    // injector applies without error and the registered builder works.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val e = GraftExtensions.dotProductBuilder(Seq(
      Literal.create(Seq(1.0, 2.0), ArrayType(DoubleType)),
      Literal.create(Seq(3.0, 4.0), ArrayType(DoubleType))))
    assert(e.eval(null) === 11.0)
    intercept[IllegalArgumentException](GraftExtensions.dotProductBuilder(Seq.empty))
  }

  test("type check rejects non-array arguments with a clear message") {
    DotProduct.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(1.0, 2.0)").collect()
    }
    assert(e.getMessage.contains("graft_dot expects"))
  }
}
