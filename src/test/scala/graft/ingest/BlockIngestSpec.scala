package graft.ingest

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Golden conversion fixture — the port of the reference's own end-to-end
  * conversion test (/root/reference/common/blocks_test.go:9-52): mainnet
  * block 18721004 with 273 receipts, read directly from the reference's
  * public testdata JSON. Pins P1/P2/P3 + U1/U2 exactly:
  * number=18721004, transactionCount=273, len(logs)=383.
  */
class BlockIngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  val blockPath = "/root/reference/testdata/eth-block-18721004.json"
  val receiptsPath = "/root/reference/testdata/eth-txn-receipts-18721004.json"

  lazy val converted = BlockIngest.convert(
    BlockIngest.readRawBlocks(spark, blockPath),
    BlockIngest.readRawReceipts(spark, receiptsPath)).cache()

  test("golden block: number / txn count / log count match the reference test") {
    val row = converted.select("number", "transactionCount").head()
    assert(row.getLong(0) === 18721004L)
    assert(row.getLong(1) === 273L)
    val nLogs = converted.select(size(col("logs"))).head().getInt(0)
    assert(nLogs === 383)
  }

  test("golden block: decoded scalars and 256-bit decimal strings") {
    val r = converted
      .select("timestamp", "gasUsed", "gasLimit", "baseFeePerGas", "totalDifficulty")
      .head()
    assert(r.getLong(0) > 1600000000L && r.getLong(0) < 2000000000L) // sane unix ts
    assert(r.getLong(2) === 30000000L) // mainnet gas limit
    assert(r.getString(3).forall(_.isDigit)) // decimal string, not hex
    assert(BigInt(r.getString(4)) > BigInt(10).pow(21)) // post-merge total difficulty
  }

  test("golden block: txns ordered by index, logs embed parent txn") {
    val idx = converted
      .select(explode(col("transactions.index")).as("i")).as[Long].collect()
    assert(idx.toSeq === (0L until 273L))
    val firstLog = converted.select(explode(col("logs")).as("l"))
      .select(col("l.index"), col("l.transaction.hash"), col("l.transaction.index"))
      .head()
    assert(firstLog.getString(1).startsWith("0x"))
  }

  test("F1 filter: wildcard passes all, membership filters, extra topics drop") {
    val logsCol = col("logs")
    val all = converted.select(size(BlockIngest.filterLogs(logsCol, Seq.empty, Seq.empty)))
      .head().getInt(0)
    assert(all === 383) // empty address + topics = wildcard (reference config path)

    val someAddr = converted.select(explode(col("logs.address"))).as[String].head()
    val byAddr = converted.select(size(BlockIngest.filterLogs(logsCol, Seq(someAddr), Seq.empty)))
      .head().getInt(0)
    assert(byAddr > 0 && byAddr < 383)

    // more filter positions than any log has topics ⇒ drop all
    val tooMany = converted.select(size(BlockIngest.filterLogs(logsCol, Seq.empty,
      Seq.fill(9)(Seq.empty)))).head().getInt(0)
    assert(tooMany === 0)

    // positional alternative match with wildcard at position 0
    val topic1 = converted
      .select(explode(col("logs"))).select(col("col.topics"))
      .filter(size(col("topics")) >= 2)
      .select(element_at(col("topics"), 2)).as[String].head()
    val pos = converted.select(size(BlockIngest.filterLogs(logsCol, Seq.empty,
      Seq(Seq.empty, Seq(topic1))))).head().getInt(0)
    assert(pos > 0 && pos < 383)
  }

  test("K2 envelope round-trips through from_json with status/version") {
    val payload = BlockIngest.envelope(converted, "ACCEPTED")
      .select("payload").as[String].head()
    assert(payload.contains(""""status":"ACCEPTED""""))
    assert(payload.contains(""""version":1"""))
    assert(payload.contains(""""number":18721004"""))
  }
}
