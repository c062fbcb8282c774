package graft

import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffled layout for repeated big-big joins: both
  * sides bucketed on the join key join WITHOUT an Exchange — at 100 TB
  * this converts every recurring key-join from a full shuffle into a
  * local merge (SURVEY.md §4 partitioning strategy). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned parquet prunes directories for partition-key predicates") {
    import graft.sources.{Sinks, Sources}
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/t"
    val df = (1 to 300).map(i => (i.toLong, s"k${i % 3}", i * 1.0)).toDF("id", "seg", "v")
    Sinks.parquet(df, dir, partitionBy = Seq("seg"))
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("seg=")) == 3)
    val q = Sources.parquet(spark, dir).filter($"seg" === "k1")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(seg"), plan)
    assert(q.count() == 100)
  }

  test("bucketed tables join with no Exchange; unbucketed ones shuffle") {
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_b")

    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val planB = bucketed.queryExecution.executedPlan.toString
      assert(!planB.contains("Exchange"),
        s"bucketed join still shuffles:\n$planB")
      assert(bucketed.count() == 1000)

      val plain = a.join(b, "k")
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
