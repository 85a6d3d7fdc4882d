package graft.tools
import org.apache.spark.sql.functions._
object DriveSmoke {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.get(4)
    import spark.implicits._
    import graft.functions.GraftExpressions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val urls = docs.select(concat(lit("HTTP://Example"), ($"doc_id" % 7).cast("string"), lit(".COM:80//a/./b/../p/"), $"doc_id".cast("string"), lit("#frag")).as("raw"))
    urls.select($"raw", canonicalize_url($"raw").as("canon"), url_host(canonicalize_url($"raw")).as("host")).show(3, false)
    val rt = docs.select($"doc_id", hex_to_long(long_to_hex($"doc_id")).as("rt"))
    println("roundtrip mismatches: " + rt.filter($"doc_id" =!= $"rt").count)
    rt.explain("formatted")
    registerAll(spark)
    spark.sql("SELECT hex_to_long('0xff') a, hex_to_long('0xzz') b, hex_to_long(NULL) c, canonicalize_url('HTTPS://X.io:443/q/../z?') d").show(false)
    val bloomUdaf = udaf(new graft.frontier.BloomAgg(10000, 0.01))
    val blooms = docs.select(xxhash64($"text").as("k"), pmod(xxhash64($"text"), lit(4)).as("shard")).groupBy($"shard").agg(bloomUdaf($"k").as("sketch"))
    val m = blooms.collect().map(r => r.getLong(0) -> graft.frontier.BloomSketch.deserialize(r.getAs[Array[Byte]](1))).toMap
    val keys = docs.select(xxhash64($"text")).as[Long].collect()
    println("bloom false negatives: " + keys.count(k => !m(java.lang.Math.floorMod(k, 4).toLong).mightContain(k)))
    println("bloom FP on 10k fresh keys: " + (1 to 10000).count(i => m(i % 4L).mightContain(i.toLong * 1234567891L + 7)))
    spark.stop()
  }
}
