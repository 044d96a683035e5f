package graft

import graft.operators.Similarity
import graft.streaming.StreamSemanticDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Online semantic dedup: the verdict stream's kept set equals the
  * batch LSH semantic dedup on clique duplicate families (planted
  * twins), duplicates resolve to their canonical base, and replays
  * change nothing.
  */
object StreamSemanticDedupSpec {
  case class Vec(vec_id: Long, embedding: Array[Float])
}

class StreamSemanticDedupSpec extends SparkSpec {
  import StreamSemanticDedupSpec.Vec

  private def withRocksDb[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("stream kept set equals batch on twin cliques; dups resolve to their base") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, sf)
    // same planted-twin construction as SimilaritySpec (seed 7):
    // vec_id+10000 is vec_id perturbed to cosine ≈ 0.997
    val base = emb.filter(col("vec_id") < 20)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val rnd = new scala.util.Random(7)
    val twins = base.map { case (id, v) =>
      val noisy = v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      val norm = math.sqrt(noisy.map(x => x.toDouble * x).sum).toFloat
      Vec(id + 10000L, noisy.map(_ / norm))
    }
    val originals = emb.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().map { case (i, v) => Vec(i, v) }
    val corpus = (originals ++ twins).toSeq
    val corpusDf = spark.createDataFrame(corpus)
    // twin families are cliques (pairs), so batch components and the
    // online greedy gate must agree exactly on who survives
    val batchKept = Similarity.lshSemanticDedup(corpusDf, tau = 0.9, nPlanes = 4)
      .filter(col("is_kept") === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet

    withRocksDb {
      val mem = MemoryStream[Vec]
      val q = StreamSemanticDedup.verdicts(mem.toDF(), tau = 0.9)
        .writeStream.format("memory").queryName("sem_dedup_t")
        .outputMode("append")
        .option("checkpointLocation", SparkEnv.scratchDir("stream-semdedup"))
        .start()
      // canonical corpus first, twins in a later micro-batch, then a
      // full twin replay — the replay must change no decision
      mem.addData(originals.toSeq)
      q.processAllAvailable()
      mem.addData(twins.toSeq)
      q.processAllAvailable()
      mem.addData(twins.toSeq)
      q.processAllAvailable()
      q.stop()
      val verdicts = spark.table("sem_dedup_t")
        .as[StreamSemanticDedup.Verdict].collect()
      val byId = verdicts.groupBy(_.vec_id)
      assert(byId.size == corpus.size, "every vector got a verdict")
      // replays may re-emit, but only with identical content
      byId.foreach { case (id, vs) =>
        assert(vs.map(v => (v.is_dup, v.dup_of)).toSet.size == 1,
          s"vec $id got conflicting verdicts")
      }
      val streamKept = byId.collect { case (id, vs) if !vs.head.is_dup => id }.toSet
      assert(streamKept == batchKept,
        s"stream-only=${(streamKept -- batchKept).take(5)} " +
          s"batch-only=${(batchKept -- streamKept).take(5)}")
      // a twin marked duplicate must resolve to its own base — nothing
      // else in the corpus is within tau=0.9 of it
      verdicts.filter(_.is_dup).foreach { v =>
        assert(v.dup_of == v.vec_id - 10000L,
          s"twin ${v.vec_id} resolved to ${v.dup_of}")
      }
      // and the gate actually fired: most twins share their base's
      // bucket (P(all 4 planes agree) ≈ 0.9 at cos 0.997)
      assert(streamKept.size < corpus.size,
        "no duplicate was detected — the planted twins should collapse")
    }
  }

  test("single-batch arrival gives the same kept set as split batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables.embeddings(spark, sf)
    val originals = emb.filter(col("vec_id") < 50).select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().map { case (i, v) => Vec(i, v) }
    val rnd = new scala.util.Random(11)
    val twins = originals.take(10).map { o =>
      val noisy = o.embedding.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      val norm = math.sqrt(noisy.map(x => x.toDouble * x).sum).toFloat
      Vec(o.vec_id + 10000L, noisy.map(_ / norm))
    }
    val corpus = (originals ++ twins).toSeq

    def runOnce(name: String, feed: MemoryStream[Vec] => Unit): Set[Long] = {
      val mem = MemoryStream[Vec]
      val q = StreamSemanticDedup.verdicts(mem.toDF(), tau = 0.9)
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", SparkEnv.scratchDir(s"stream-semdedup-$name"))
        .start()
      feed(mem)
      q.processAllAvailable()
      q.stop()
      spark.table(name).as[StreamSemanticDedup.Verdict].collect()
        .filter(!_.is_dup).map(_.vec_id).toSet
    }

    withRocksDb {
      // within one micro-batch the processor sorts by vec_id, and this
      // parity split keeps each twin in the same batch as its base —
      // so the canonical choice (min id first) matches across feeds.
      // (A feed that delivers a twin BEFORE its base would keep the
      // twin instead: greedy online order-dependence, which is why the
      // declared query is rows-only.)
      val oneShot = runOnce("sem_dedup_one", _.addData(corpus))
      val split = runOnce("sem_dedup_split", { m =>
        m.addData(corpus.filter(_.vec_id % 2 == 0)); m.addData(corpus.filter(_.vec_id % 2 == 1))
      })
      assert(oneShot == split,
        s"one-shot-only=${(oneShot -- split).take(5)} split-only=${(split -- oneShot).take(5)}")
    }
  }
}
