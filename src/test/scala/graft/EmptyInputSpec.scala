package graft

/** Empty-input robustness: every declared query must execute (possibly
  * to zero rows) against structurally-identical but EMPTY tables. At
  * 100 TB empty partitions, empty date ranges, and freshly-created
  * tables are routine; an operator that throws on them is broken.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = SparkEnv.scratchDir("empty-sf")
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
    names.foreach { n =>
      spark.read.parquet(s"$sf/$n.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    // events.parquet: the plain read round-trips whatever physical ts
    // type the fixture carries (Tables.events is unit-aware, so the
    // empty twin just needs the same surfaced type)
    spark.read.parquet(s"$sf/events.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("every declared query runs on empty tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n", "\n", ""))
  }
}
