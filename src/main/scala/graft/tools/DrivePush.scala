package graft.tools
import graft.ingest.{BlockIngest, PushIngest}
import org.apache.spark.sql.functions._
object DrivePush {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.get(4)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("push")
    val ev = """{"data":{"block":{"hash":"0xabc","number":100,"timestamp":1700000000,"parent":{"hash":"0xdef"},"baseFeePerGas":"0xde0b6b3a7640000","gasUsed":21000,"gasLimit":30000000,"mixHash":"0x0","stateRoot":"0x1","difficulty":"0","totalDifficulty":"1","nonce":"0x0","transactionCount":5,"transactionsRoot":"0x2","receiptsRoot":"0x3","logsBloom":"0x4","transactions":[],"logs":[{"data":"0xdd","topics":["0xt0"],"index":7,"account":{"address":"0xaaaa"},"transaction":{"hash":"0xth","nonce":3,"index":2,"from":{"address":"0xf"},"to":{"address":"0xt"},"value":"0xde0b6b3a7640000","gasPrice":"0x3b9aca00","maxFeePerGas":"0x1","maxPriorityFeePerGas":"0x1","gas":21000,"status":1,"gasUsed":21000,"cumulativeGasUsed":42000,"effectiveGasPrice":"0x3b9aca00","createdContract":{"address":""}}}]}},"sequenceNumber":"10"}"""
    java.nio.file.Files.writeString(dir.resolve("e.json"), ev)
    val push = PushIngest.convert(PushIngest.readPushEvents(spark, dir.resolve("e.json").toString))
    push.select("number","parentHash","baseFeePerGas","transactionCount").show(false)
    println("PUSH envelope: " + BlockIngest.envelope(push, "ACCEPTED").as[String].head().take(160))
    // probe: malformed event (missing block) -> PERMISSIVE nulls, no crash
    java.nio.file.Files.writeString(dir.resolve("bad.json"), """{"sequenceNumber":"11"}""")
    val bad = PushIngest.convert(PushIngest.readPushEvents(spark, dir.resolve("bad.json").toString))
    println("PUSH malformed rows=" + bad.count() + " number_null=" + bad.filter(col("number").isNull).count())
    // probe: pull+push union through one shared downstream
    val pull = BlockIngest.convert(
      BlockIngest.readRawBlocks(spark, "/root/reference/testdata/eth-block-18721004.json"),
      BlockIngest.readRawReceipts(spark, "/root/reference/testdata/eth-txn-receipts-18721004.json"))
    println("PUSH union envelopes=" + BlockIngest.envelope(pull.unionByName(push), "ACCEPTED").count())
    spark.stop()
  }
}
