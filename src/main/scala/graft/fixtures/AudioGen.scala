package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic audio fixtures: seeded pure-sine WAV (PCM16 mono) clips.
  * Real bytes through the real container format — [[graft.multimodal
  * .Multimodal.audioFeatures]] decodes them with the JDK's own
  * javax.sound.sampled (no external codec needed for WAV), and because the
  * signal is analytic, the decoded features have closed forms an external
  * oracle can compute from the id alone: RMS = A/√2 (± 16-bit quantization,
  * ~3·10⁻⁶ — far inside the 2-decimal rounding the oracle compares),
  * n_samples = sr · ms / 1000.
  *
  * Amplitudes are drawn from a set whose A/√2 values all sit ≥ 1.4·10⁻³
  * away from a 2-decimal rounding boundary, so quantization can never flip
  * the oracle compare.
  */
object AudioGen {

  val SampleRate = 16000

  def idOf(i: Long): String = f"aud$i%06d"
  def durationMs(i: Long): Long = 200L + (i % 8) * 100L
  def freqHz(i: Long): Double = 220.0 * (1 + i % 12)
  def amplitude(i: Long): Double = 0.20 + 0.05 * (i % 10)

  /** 44-byte RIFF/WAVE header + PCM16LE mono samples of a pure sine. */
  def waveBytes(i: Long): Array[Byte] = {
    val n = (SampleRate * durationMs(i) / 1000L).toInt
    val a = amplitude(i)
    val f = freqHz(i)
    val data = new Array[Byte](44 + n * 2)
    val bb = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(SampleRate).putInt(SampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(n * 2)
    var k = 0
    while (k < n) {
      val v = a * math.sin(2.0 * math.Pi * f * k / SampleRate)
      bb.putShort(math.round(v * 32767.0).toShort)
      k += 1
    }
    data
  }

  /** Distributed generation of the (media_id, bytes) audio table. */
  def generate(spark: SparkSession, n: Long, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, parts).as[Long]
      .map(i => (idOf(i), waveBytes(i)))
      .toDF("media_id", "bytes")
  }
}
