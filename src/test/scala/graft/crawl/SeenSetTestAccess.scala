package graft.crawl

import graft.frontier.SeenSet
import graft.tables.SnapshotTable
import org.apache.spark.sql.SparkSession

/** Test helper: a probe provider over the blooms table a crawl committed. */
object SeenSetTestAccess {
  def provider(spark: SparkSession, state: SnapshotTable): SeenSet.BloomShardProvider =
    SeenSet.broadcastProvider(spark, state.read(spark, "blooms"))
}
