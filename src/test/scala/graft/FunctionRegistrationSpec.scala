package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** SQL reachability of the native expressions (VERDICT r2 item 8): after
  * registration, cosine_sim/band_sig resolve from SQL text and agree
  * bit-for-bit with the Column API; the new input-type checks reject
  * non-float arrays at analysis time instead of computing garbage.
  */
class FunctionRegistrationSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim and band_sig are callable from SQL and match the Column API") {
    GraftFunctions.registerAll(spark)
    val cosSql = spark.sql(
      """SELECT cosine_sim(array(cast(3.0 as float), cast(4.0 as float)),
                           array(cast(3.0 as float), cast(4.0 as float))) AS c""")
      .head().getDouble(0)
    assert(math.abs(cosSql - 1.0) < 1e-12)
    val df = Seq((Array(1.0f, -0.5f, 0.25f), Array(0.5f, 0.5f, -1.0f)))
      .toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql(
      "SELECT cosine_sim(a, b) AS c, band_sig(a, 4, 4) AS s FROM vecs").head()
    val viaCol = df.select(
      GraftFunctions.cosine_sim(col("a"), col("b")).as("c"),
      GraftFunctions.band_sig(col("a"), 4, 4).as("s")).head()
    assert(viaSql.getDouble(0) === viaCol.getDouble(0))
    assert(viaSql.getSeq[Long](1) === viaCol.getSeq[Long](1))
    assert(viaSql.getSeq[Long](1).length === 4)
  }

  test("two instances of a native expression codegen into ONE function") {
    // Regression: doGenCode used raw Java local names (i, n, dot, …) — two
    // cosine_sim/band_sig calls in one predicate/projection redeclared
    // them, Janino rejected the class, and Spark silently fell back to
    // interpreted eval. CODEGEN_ONLY turns that silent fallback into a
    // test failure.
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val df = Seq((Array(1.0f, 2.0f), Array(0.5f, -1.0f), Array(2.0f, 2.0f)))
        .toDF("a", "b", "c")
      val r = df
        .filter(GraftFunctions.cosine_sim(col("a"), col("b")) > -2.0 &&
          GraftFunctions.cosine_sim(col("a"), col("c")) > -2.0)
        .select(
          GraftFunctions.band_sig(col("a"), 2, 2).as("s1"),
          GraftFunctions.band_sig(col("b"), 2, 2).as("s2"))
        .collect()
      assert(r.length === 1)
    } finally {
      old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("input-type checks reject non-float arrays at analysis time") {
    GraftFunctions.registerAll(spark)
    intercept[AnalysisException] {
      spark.sql("SELECT cosine_sim(array(1.0), array(1.0))").collect()
    }
    intercept[AnalysisException] {
      spark.sql("SELECT band_sig(array(1.0), 4, 4)").collect()
    }
  }
}
