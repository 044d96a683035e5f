package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** DotProductF: codegen correctness = interpreted = HOF fold, null
  * semantics, SQL registration.
  */
class VectorExprSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf)

  test("vec_dot equals the HOF fold bit-for-bit on real vectors") {
    val pairs = emb.select(col("vec_id").as("id_a"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("id_b"), col("embedding").as("b")))
      .filter(col("id_a") < col("id_b")).limit(500)
    val diff = pairs.select(
      VectorFunctions.vec_dot(col("a"), col("b")).as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
        "CAST(0 AS DOUBLE), (s, x) -> s + x)").as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
  }

  test("unit vectors have self-dot ~ 1") {
    import spark.implicits._
    val selfs = emb.select(VectorFunctions.vec_dot(col("embedding"), col("embedding")))
      .as[Double].collect()
    assert(selfs.forall(d => math.abs(d - 1.0) < 1e-5))
  }

  test("null input yields null") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0f, 2.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(VectorFunctions.vec_dot(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("scala UDF (J1 surface) agrees with the codegen expression") {
    import org.apache.spark.sql.functions.udf
    val dotUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val pairs = emb.select(col("vec_id").as("id_a"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("id_b"), col("embedding").as("b")))
      .filter(col("id_a") < col("id_b")).limit(200)
    val diff = pairs.select(
      VectorFunctions.vec_dot(col("a"), col("b")).as("fast"),
      dotUdf(col("a"), col("b")).as("viaUdf"))
      .filter(col("fast") =!= col("viaUdf"))
    assert(diff.count() == 0)
  }

  test("SQL registration works") {
    VectorFunctions.register(spark)
    emb.limit(5).createOrReplaceTempView("emb_t")
    val n = spark.sql(
      "SELECT vec_dot(embedding, embedding) AS d FROM emb_t").count()
    assert(n == 5)
  }
}
