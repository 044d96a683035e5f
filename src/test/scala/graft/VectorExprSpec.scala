package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** DotProductF: codegen correctness = interpreted = HOF fold, null
  * semantics, SQL registration.
  */
class VectorExprSpec extends SparkSpec {

  test("char_ngrams generator: counts, short-text padding, null, LATERAL VIEW") {
    import spark.implicits._
    val df = Seq((1L, "abcde"), (2L, "ab"), (3L, null.asInstanceOf[String]))
      .toDF("id", "t")
    df.createOrReplaceTempView("cn_t")
    val rows = spark.sql(
      "SELECT id, ngram FROM cn_t LATERAL VIEW char_ngrams(t, 3) g AS ngram")
      .collect().map(r => (r.getLong(0), r.getString(1))).toList.sorted
    // len 5 -> 3 grams; len 2 < n -> whole text once; null -> no rows
    assert(rows == List((1L, "abc"), (1L, "bcd"), (1L, "cde"), (2L, "ab")), rows)
    // n <= 0 emits nothing rather than throwing
    assert(spark.sql(
      "SELECT ngram FROM cn_t LATERAL VIEW char_ngrams(t, 0) g AS ngram")
      .count() == 0)
    // non-BMP safety: slices by code points, never through a surrogate
    // pair — "ab😀cd" is 5 characters -> 3 well-formed trigrams
    val emoji = Seq((1L, "ab😀cd")).toDF("id", "t")
    emoji.createOrReplaceTempView("cn_emoji")
    val grams = spark.sql(
      "SELECT ngram FROM cn_emoji LATERAL VIEW char_ngrams(t, 3) g AS ngram")
      .collect().map(_.getString(0)).toList
    assert(grams == List("ab😀", "b😀c", "😀cd"), grams)
  }

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

  test("sign_bucket equals the composed per-plane form bit-for-bit") {
    import graft.operators.Similarity
    // every plane count the call sites use, on the full fixture table
    for (nPlanes <- Seq(4, 8, 16)) {
      val planes = Similarity.hyperplanes(nPlanes)
      val diff = emb.select(
          Similarity.bucketCol("embedding", planes).as("fused"),
          Similarity.bucketColComposed("embedding", planes).as("composed"))
        .filter(col("fused") =!= col("composed"))
      assert(diff.count() == 0, s"fused != composed at $nPlanes planes")
    }
  }

  test("sign_bucket edge shapes: null maps to bucket 0, wrong length throws") {
    import graft.operators.Similarity
    import spark.implicits._
    val planes = Similarity.hyperplanes(4)
    // the composed when/otherwise form bucketed NULL embeddings to 0;
    // bucketCol's coalesce preserves that exactly
    val withNull = Seq((1L, Array.fill(64)(0.1f)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val got = withNull.select(col("vec_id"),
        Similarity.bucketCol("embedding", planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = withNull.select(col("vec_id"),
        Similarity.bucketColComposed("embedding", planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == composed, s"$got vs $composed")
    assert(got(2L) == 0L)
    // length mismatch is a data error, loudly — same contract as vec_dot
    val short = Seq((1L, Array.fill(32)(0.1f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      short.select(Similarity.bucketCol("embedding", planes)).collect()
    }
    assert(e.getMessage != null)
  }

  test("sign_bucket randomized parity across dims and plane counts") {
    import graft.operators.Similarity
    import spark.implicits._
    val rnd = new scala.util.Random(123)
    // random vectors incl. negatives, zeros, denormal-ish tiny values
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(
        if (rnd.nextInt(10) == 0) 0.0f
        else (rnd.nextGaussian() * math.pow(10, rnd.nextInt(8) - 4)).toFloat))
    }.toDF("vec_id", "embedding")
    val planes = Similarity.hyperplanes(16, seed = 99L)
    val diff = vecs.select(
        Similarity.bucketCol("embedding", planes).as("fused"),
        Similarity.bucketColComposed("embedding", planes).as("composed"))
      .filter(col("fused") =!= col("composed"))
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
