package graft.tools

import graft.`export`.ShardExport
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evidence for the shard-export scale contract: assignShards must be
  * LINEAR in row count (two narrow keyed exchanges — the range partition
  * and the pid window — plus a P-row broadcast; nothing single-partition
  * on the data path) and its plan must be the documented one. The naive
  * alternative (one global Window.orderBy) is timed alongside at the small
  * size only, to show what the operator avoids.
  *
  *   sbt -batch 'runMain graft.tools.DriveShardScale 8 3'
  */
object DriveShardScale {
  def main(a: Array[String]): Unit = {
    val cores = a.headOption.map(_.toInt).getOrElse(8)
    val reps = a.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.get(cores)
    spark.sparkContext.setLogLevel("WARN")

    def rowsOf(n: Long): DataFrame =
      spark.range(0, n, 1, cores * 4).select(col("id"),
        (pmod(xxhash64(col("id")), lit(4000L)) + 64L).as("sz"))

    def timed(body: => Long): (Double, Long) = {
      var out = 0L
      def run(): Double = {
        val t0 = System.nanoTime()
        out = body
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm (discarded)
      ((1 to reps).map(_ => run()).min, out)
    }

    def shards(n: Long): Long =
      ShardExport.manifest(
        ShardExport.assignShards(rowsOf(n), "id", "sz", targetSize = 1L << 20),
        "sz").count()

    val (t1, s1) = timed(shards(1000000L))
    val (t10, s10) = timed(shards(10000000L))
    println(f"SHARD two-phase  1M rows: shards=$s1%d secs=$t1%.3f")
    println(f"SHARD two-phase 10M rows: shards=$s10%d secs=$t10%.3f " +
      f"ratio=${t10 / t1}%.2f (linear => ~10)")

    // the anti-pattern, small size only: global single-partition window
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val (tn, _) = timed {
      rowsOf(1000000L)
        .withColumn("shard_id", floor((sum(col("sz")).over(w) - col("sz")) / 1048576.0))
        .groupBy("shard_id").count().count()
    }
    println(f"SHARD naive global window 1M rows: secs=$tn%.3f " +
      f"(vs two-phase $t1%.3f at the same size)")

    val plan = ShardExport.assignShards(rowsOf(1000000L), "id", "sz", 1L << 20)
      .queryExecution.executedPlan.toString
    val singles = "Exchange SinglePartition".r.findAllIn(plan).length
    println(s"SHARD plan: rangepartitioning=${plan.contains("rangepartitioning")} " +
      s"singlePartitionExchanges=$singles (must be <=1, the P-row offsets)")
    spark.stop()
  }
}
