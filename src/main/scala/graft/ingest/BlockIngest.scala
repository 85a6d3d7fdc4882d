package graft.ingest

import graft.functions.GraftExpressions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's ingestion pipeline (SURVEY.md §2.3 P1/P2/P3, §2.4 F1,
  * §2.2 K2/K3) restated as Spark dataflow:
  *
  *   RawBlock (all-hex JSON) ⋈ receipts → canonical Block with nested
  *   converted transactions and flattened logs (each log embedding its
  *   parent transaction — the reference's denormalization,
  *   /root/reference/common/logs.go:17-25), hex quantities decoded with the
  *   lenient zero-on-error contract and 256-bit values kept as decimal
  *   strings (/root/reference/common/txns.go:45-65, util/util.go:53-97).
  *
  * The txn⋈receipt lookup (/root/reference/common/blocks.go:50-55) becomes an
  * equi-join on transactionHash; the per-block nested arrays are rebuilt with
  * sort_array(collect_list(struct(index, ...))) so ordering is positional
  * (index asc), matching the reference's positional zip
  * (/root/reference/common/blocks.go:44-48).
  */
object BlockIngest {

  // ---- explicit Raw schemas (FIXTURES.md §1; never inferred) -------------

  val rawLogSchema: StructType = StructType(Seq(
    StructField("address", StringType), StructField("topics", ArrayType(StringType)),
    StructField("data", StringType), StructField("blockNumber", StringType),
    StructField("transactionIndex", StringType), StructField("transactionHash", StringType),
    StructField("blockHash", StringType), StructField("logIndex", StringType),
    StructField("removed", BooleanType)))

  val rawTransactionSchema: StructType = StructType(Seq(
    "blockHash", "blockNumber", "from", "gas", "gasPrice", "maxFeePerGas",
    "maxPriorityFeePerGas", "hash", "input", "nonce", "to", "transactionIndex",
    "value", "type", "chainId", "v", "r", "s").map(StructField(_, StringType)))

  val rawReceiptSchema: StructType = StructType(Seq(
    StructField("blockHash", StringType), StructField("blockNumber", StringType),
    StructField("contractAddress", StringType), StructField("cumulativeGasUsed", StringType),
    StructField("from", StringType), StructField("effectiveGasPrice", StringType),
    StructField("gasUsed", StringType), StructField("logs", ArrayType(rawLogSchema)),
    StructField("logsBloom", StringType), StructField("status", StringType),
    StructField("to", StringType), StructField("transactionHash", StringType),
    StructField("transactionIndex", StringType), StructField("type", StringType)))

  val rawBlockSchema: StructType = StructType(Seq(
    StructField("number", StringType), StructField("hash", StringType),
    StructField("parentHash", StringType), StructField("sha3Uncles", StringType),
    StructField("miner", StringType), StructField("mixHash", StringType),
    StructField("stateRoot", StringType), StructField("receiptsRoot", StringType),
    StructField("transactionsRoot", StringType), StructField("logsBloom", StringType),
    StructField("extraData", StringType), StructField("timestamp", StringType),
    StructField("size", StringType), StructField("gasUsed", StringType),
    StructField("gasLimit", StringType), StructField("nonce", StringType),
    StructField("difficulty", StringType), StructField("totalDifficulty", StringType),
    StructField("baseFeePerGas", StringType),
    StructField("transactions", ArrayType(rawTransactionSchema)),
    StructField("uncles", ArrayType(StringType))))

  def readRawBlocks(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", true).schema(rawBlockSchema).json(path)

  /** Receipts fixture is a top-level JSON array → one row per element. */
  def readRawReceipts(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", true).schema(rawReceiptSchema).json(path)

  /** P2: converted-transaction struct (txn fields ⋈ receipt fields). */
  private def txnStruct: Column = struct(
    col("t.from").as("from"),
    hex_to_long(col("t.gas")).as("gas"),
    hex_to_long(col("t.gasPrice")).as("gasPrice"),
    col("t.hash").as("hash"),
    hex_to_long(col("t.transactionIndex")).as("index"),
    hex_to_long(col("t.maxFeePerGas")).as("maxFeePerGas"),
    hex_to_long(col("t.maxPriorityFeePerGas")).as("maxPriorityFeePerGas"),
    hex_to_long(col("t.nonce")).as("nonce"),
    col("t.to").as("to"),
    hex_to_decimal_string(col("t.value")).as("value"),
    hex_to_long(col("r.status")).as("status"),
    hex_to_long(col("r.gasUsed")).as("gasUsed"),
    hex_to_long(col("r.cumulativeGasUsed")).as("cumulativeGasUsed"),
    hex_to_long(col("r.effectiveGasPrice")).as("effectiveGasPrice"),
    col("r.contractAddress").as("createdContract"))

  /** P1+P2+P3: raw blocks + raw receipts → canonical blocks.
    *
    * One row out per block: decoded scalars, transactions array (index
    * order), logs array flattened across receipts with parent txn embedded
    * (txn-index, log-index order), transactionCount = len(transactions).
    */
  def convert(rawBlocks: DataFrame, rawReceipts: DataFrame): DataFrame = {
    val txns = rawBlocks
      .select(col("hash").as("block_hash"), explode(col("transactions")).as("t"))
    val joined = txns.join(
      rawReceipts.as("r0").select(struct(col("r0.*")).as("r")),
      col("t.hash") === col("r.transactionHash"), "left")

    val convTxns = joined
      .select(col("block_hash"), txnStruct.as("txn"), col("r.logs").as("raw_logs"))

    // P3: flatten logs, embed parent (converted) txn
    val logs = convTxns
      .select(col("block_hash"), col("txn"), explode(col("raw_logs")).as("l"))
      .select(col("block_hash"), struct(
        col("l.address").as("address"),
        col("l.topics").as("topics"),
        col("l.data").as("data"),
        hex_to_long(col("l.logIndex")).as("index"),
        col("txn").as("transaction")).as("log"),
        col("txn.index").as("t_idx"))

    val txnsPerBlock = convTxns.groupBy(col("block_hash"))
      .agg(transform(sort_array(collect_list(struct(col("txn.index").as("i"), col("txn").as("x")))),
        e => e("x")).as("conv_transactions"))
    val logsPerBlock = logs.groupBy(col("block_hash"))
      .agg(transform(sort_array(collect_list(struct(col("t_idx"), col("log.index").as("li"),
        col("log").as("x")))), e => e("x")).as("conv_logs"))

    rawBlocks
      .join(txnsPerBlock, col("hash") === txnsPerBlock("block_hash"), "left")
      .drop("block_hash")
      .join(logsPerBlock, col("hash") === logsPerBlock("block_hash"), "left")
      .drop("block_hash")
      .select(
        hex_to_long(col("number")).as("number"),
        hex_to_long(col("timestamp")).as("timestamp"),
        col("hash"), col("parentHash"),
        coalesce(col("conv_transactions"), array()).as("transactions"),
        hex_to_decimal_string(col("baseFeePerGas")).as("baseFeePerGas"),
        hex_to_long(col("gasUsed")).as("gasUsed"),
        hex_to_long(col("gasLimit")).as("gasLimit"),
        col("mixHash"), col("stateRoot"),
        hex_to_decimal_string(col("totalDifficulty")).as("totalDifficulty"),
        col("sha3Uncles"), col("miner"),
        hex_to_decimal_string(col("difficulty")).as("difficulty"),
        col("nonce"),
        coalesce(size(col("conv_transactions")), lit(0)).cast("long").as("transactionCount"),
        col("transactionsRoot"), col("receiptsRoot"), col("logsBloom"),
        col("extraData"), col("uncles"),
        coalesce(col("conv_logs"), array()).as("logs"))
  }

  // ---- F1: per-sink log filter (intended geth semantics, SURVEY §2.4) ---

  /** Filter a block's logs array per sink config. `addresses` empty =
    * wildcard; `topics(i)` is the OR-set of alternatives for position i,
    * empty set = wildcard at i; a log with fewer topics than the filter is
    * dropped. (The reference's rune bug is NOT reproduced — SURVEY.md §2.4.)
    */
  def filterLogs(logs: Column, addresses: Seq[String], topics: Seq[Seq[String]]): Column = {
    val addrPred: Column => Column = log =>
      if (addresses.isEmpty) lit(true)
      else array_contains(lit(addresses.toArray), log.getField("address"))
    val topicPred: Column => Column = log => {
      val lenOk = size(log.getField("topics")) >= topics.size
      topics.zipWithIndex.foldLeft(lenOk) { case (acc, (alts, i)) =>
        if (alts.isEmpty) acc
        else acc && array_contains(lit(alts.toArray),
          element_at(log.getField("topics"), i + 1))
      }
    }
    filter(logs, log => addrPred(log) && topicPred(log))
  }

  /** K2/K3: wrap canonical blocks in the sink envelope and serialize. */
  def envelope(blocks: DataFrame, status: String,
      addresses: Seq[String] = Seq.empty,
      topics: Seq[Seq[String]] = Seq.empty): DataFrame =
    blocks
      .withColumn("logs", filterLogs(col("logs"), addresses, topics))
      .select(to_json(struct(
        lit(status).as("status"),
        struct(blocks.columns.map(col).toSeq: _*).as("block"),
        lit(1).as("version")), Map("ignoreNullFields" -> "true")).as("payload"))
}
