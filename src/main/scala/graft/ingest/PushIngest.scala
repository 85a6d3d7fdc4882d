package graft.ingest

import graft.functions.GraftExpressions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** P4: the alternate PUSH-source projection (SURVEY.md §2.3) — a
  * webhook-shaped event (numbers already decoded, nested account objects,
  * logs carrying their transaction inline) mapped onto the SAME canonical
  * Block schema that [[BlockIngest.convert]] produces from the pull path, so
  * everything downstream (filter, envelope, sink) is shared.
  *
  * Faithful to the reference's evident behavior
  * (/root/reference/common/alchemy.go:113-143): transactions are NOT
  * converted (the reference's loop is commented out) — the push block
  * carries logs only, each embedding its converted parent transaction;
  * `transactionCount` comes from the event header, not len(transactions).
  * HMAC ingress verification (U11) is [[isValidSignature]], applied at the
  * ingress boundary before conversion.
  */
object PushIngest {

  /** U11: webhook ingress HMAC-SHA256 verification — the reference's
    * isValidSignature (/root/reference/cmd/transmuted/main.go:67-72):
    * lower-hex(HMAC_SHA256(signingKey, rawBody)) must equal the presented
    * signature. Constant-time compare.
    */
  def isValidSignature(body: Array[Byte], signingKey: String, signatureHex: String): Boolean = {
    if (body == null || signingKey == null || signatureHex == null) return false
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      signingKey.getBytes(java.nio.charset.StandardCharsets.UTF_8), "HmacSHA256"))
    val hex = mac.doFinal(body).map(b => f"${b & 0xff}%02x").mkString
    java.security.MessageDigest.isEqual(
      hex.getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      signatureHex.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
  }

  /** The signature an authentic sender attaches (test/fixture side). */
  def sign(body: Array[Byte], signingKey: String): String = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      signingKey.getBytes(java.nio.charset.StandardCharsets.UTF_8), "HmacSHA256"))
    mac.doFinal(body).map(b => f"${b & 0xff}%02x").mkString
  }

  private val account = StructType(Seq(StructField("address", StringType)))

  val pushTxnSchema: StructType = StructType(Seq(
    StructField("hash", StringType), StructField("nonce", LongType),
    StructField("index", LongType), StructField("from", account),
    StructField("to", account), StructField("value", StringType),
    StructField("gasPrice", StringType), StructField("maxFeePerGas", StringType),
    StructField("maxPriorityFeePerGas", StringType), StructField("gas", LongType),
    StructField("status", LongType), StructField("gasUsed", LongType),
    StructField("cumulativeGasUsed", LongType),
    StructField("effectiveGasPrice", StringType),
    StructField("createdContract", account)))

  val pushLogSchema: StructType = StructType(Seq(
    StructField("data", StringType), StructField("topics", ArrayType(StringType)),
    StructField("index", LongType), StructField("account", account),
    StructField("transaction", pushTxnSchema)))

  val pushBlockSchema: StructType = StructType(Seq(
    StructField("hash", StringType), StructField("number", LongType),
    StructField("timestamp", LongType),
    StructField("parent", StructType(Seq(StructField("hash", StringType)))),
    StructField("baseFeePerGas", StringType), StructField("gasUsed", LongType),
    StructField("gasLimit", LongType), StructField("mixHash", StringType),
    StructField("stateRoot", StringType), StructField("difficulty", StringType),
    StructField("totalDifficulty", StringType), StructField("nonce", StringType),
    StructField("transactionCount", LongType),
    StructField("transactionsRoot", StringType), StructField("receiptsRoot", StringType),
    StructField("logsBloom", StringType),
    StructField("transactions", ArrayType(pushTxnSchema)),
    StructField("logs", ArrayType(pushLogSchema))))

  val pushEventSchema: StructType = StructType(Seq(
    StructField("data", StructType(Seq(StructField("block", pushBlockSchema)))),
    StructField("sequenceNumber", StringType)))

  def readPushEvents(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", true).schema(pushEventSchema).json(path)

  /** Converted-transaction struct from a push txn column. */
  private def txn(t: org.apache.spark.sql.Column) = struct(
    t.getField("from").getField("address").as("from"),
    t.getField("gas").as("gas"),
    hex_to_long(t.getField("gasPrice")).as("gasPrice"),
    t.getField("hash").as("hash"),
    t.getField("index").as("index"),
    hex_to_long(t.getField("maxFeePerGas")).as("maxFeePerGas"),
    hex_to_long(t.getField("maxPriorityFeePerGas")).as("maxPriorityFeePerGas"),
    t.getField("nonce").as("nonce"),
    t.getField("to").getField("address").as("to"),
    hex_to_decimal_string(t.getField("value")).as("value"),
    t.getField("status").as("status"),
    t.getField("gasUsed").as("gasUsed"),
    t.getField("cumulativeGasUsed").as("cumulativeGasUsed"),
    hex_to_long(t.getField("effectiveGasPrice")).as("effectiveGasPrice"),
    t.getField("createdContract").getField("address").as("createdContract"))

  /** Push events → canonical Block rows (same schema as BlockIngest.convert). */
  def convert(events: DataFrame): DataFrame = {
    val b = col("data").getField("block")
    events.select(
      b.getField("number").as("number"),
      b.getField("timestamp").as("timestamp"),
      b.getField("hash").as("hash"),
      b.getField("parent").getField("hash").as("parentHash"),
      // reference skips txn conversion on the push path (alchemy.go:115-118)
      array().cast(ArrayType(txnType)).as("transactions"),
      hex_to_decimal_string(b.getField("baseFeePerGas")).as("baseFeePerGas"),
      b.getField("gasUsed").as("gasUsed"),
      b.getField("gasLimit").as("gasLimit"),
      b.getField("mixHash").as("mixHash"),
      b.getField("stateRoot").as("stateRoot"),
      b.getField("totalDifficulty").as("totalDifficulty"),
      lit(null).cast(StringType).as("sha3Uncles"),
      lit(null).cast(StringType).as("miner"),
      b.getField("difficulty").as("difficulty"),
      b.getField("nonce").as("nonce"),
      b.getField("transactionCount").as("transactionCount"),
      b.getField("transactionsRoot").as("transactionsRoot"),
      b.getField("receiptsRoot").as("receiptsRoot"),
      b.getField("logsBloom").as("logsBloom"),
      lit(null).cast(StringType).as("extraData"), // absent on the push path
      lit(null).cast(ArrayType(StringType)).as("uncles"),
      transform(b.getField("logs"), l => struct(
        l.getField("account").getField("address").as("address"),
        l.getField("topics").as("topics"),
        l.getField("data").as("data"),
        l.getField("index").as("index"),
        txn(l.getField("transaction")).as("transaction"))).as("logs"))
  }

  /** Canonical converted-transaction type (matches BlockIngest's txnStruct). */
  private val txnType: StructType = StructType(Seq(
    StructField("from", StringType), StructField("gas", LongType),
    StructField("gasPrice", LongType), StructField("hash", StringType),
    StructField("index", LongType), StructField("maxFeePerGas", LongType),
    StructField("maxPriorityFeePerGas", LongType), StructField("nonce", LongType),
    StructField("to", StringType), StructField("value", StringType),
    StructField("status", LongType), StructField("gasUsed", LongType),
    StructField("cumulativeGasUsed", LongType),
    StructField("effectiveGasPrice", LongType),
    StructField("createdContract", StringType)))
}
