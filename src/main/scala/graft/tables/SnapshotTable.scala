package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Iceberg-style snapshot table layer: partitioned parquet + an atomically
  * committed manifest pointer, giving the three properties the crawl state
  * machine needs (SURVEY.md §7): atomic snapshot commit, resumable cursor,
  * time travel. No Iceberg runtime jar ships in this sandbox, so the
  * manifest is a JSON file and the commit point is a filesystem
  * atomic-rename of the LATEST pointer — the same commit discipline as the
  * reference's whole-file checkpoint overwrite
  * (/root/reference/state/state.go:83-96), but versioned instead of
  * destructive. On a real deployment this class is the seam where an actual
  * Iceberg/Delta catalog plugs in.
  *
  * Layout:
  *   dir/snap-%06d/<name>/   parquet per logical table
  *   dir/snap-%06d/MANIFEST  committed table names + row counts
  *   dir/LATEST              current snapshot id (atomic rename target)
  *
  * A crash between data write and LATEST rename leaves an orphan snapshot
  * directory that is never referenced — readers only follow LATEST, so
  * resume semantics are exactly "last committed snapshot" (at-least-once
  * downstream, SURVEY.md §2.9).
  */
final class SnapshotTable(val dir: String) {
  private val root: Path = Paths.get(dir)

  private def snapDir(id: Long): Path = root.resolve(f"snap-$id%06d")

  def latestSnapshot: Option[Long] = {
    val p = root.resolve("LATEST")
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** Write all `tables` as parquet under a new snapshot, then atomically
    * publish it. `appendOnly` tables write ONLY the given delta as a new
    * segment; the manifest carries the previous snapshot's segment list
    * forward — the Iceberg append-commit shape. This is what keeps a
    * monotonically-growing table (the 10^10-row seen set) O(delta) per
    * round instead of O(total).
    *
    * Returns the new snapshot id.
    */
  def commit(tables: Map[String, DataFrame],
      appendOnly: Map[String, DataFrame] = Map.empty): Long = {
    val prev = latestSnapshot
    val id = prev.map(_ + 1).getOrElse(0L)
    val sd = snapDir(id)
    Files.createDirectories(sd)
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(sd.resolve(name).toString)
    }
    val appended: Map[String, Seq[String]] = appendOnly.map { case (name, df) =>
      val seg = sd.resolve(name).toString
      df.write.mode("overwrite").parquet(seg)
      name -> (prev.map(p => segmentsOf(p, name)).getOrElse(Seq.empty) :+ seg)
    }
    // tables present in the previous snapshot but not rewritten or appended
    // this commit carry their segment list forward untouched
    val carried: Map[String, Seq[String]] = prev match {
      case Some(p) => manifestOf(p).view
        .filterKeys(n => !tables.contains(n) && !appendOnly.contains(n)).toMap
      case None => Map.empty
    }
    val manifest =
      (tables.keys.map(n => s"$n\t${snapDir(id).resolve(n)}") ++
        appended.map { case (n, segs) => s"$n\t${segs.mkString("\t")}" } ++
        carried.map { case (n, segs) => s"$n\t${segs.mkString("\t")}" })
        .toSeq.sorted.mkString("\n")
    Files.writeString(sd.resolve("MANIFEST"), manifest)
    val tmp = root.resolve(s".LATEST.tmp-$id")
    Files.writeString(tmp, id.toString)
    Files.move(tmp, root.resolve("LATEST"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    id
  }

  private def manifestOf(id: Long): Map[String, Seq[String]] =
    Files.readString(snapDir(id).resolve("MANIFEST")).split("\n")
      .filter(_.nonEmpty)
      .map { line =>
        val parts = line.split("\t").toSeq
        parts.head -> parts.tail
      }.toMap

  /** Data paths (segments) of a table at a snapshot. */
  def segmentsOf(id: Long, name: String): Seq[String] = manifestOf(id)(name)

  /** Read a logical table at the latest (or a pinned) snapshot — unions all
    * of its segments for append-only tables.
    */
  def read(spark: SparkSession, name: String, snapshot: Option[Long] = None): DataFrame = {
    val id = snapshot.orElse(latestSnapshot).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $dir"))
    spark.read.parquet(segmentsOf(id, name): _*)
  }

  def tableNames(snapshot: Option[Long] = None): Seq[String] = {
    val id = snapshot.orElse(latestSnapshot).getOrElse(return Seq.empty)
    manifestOf(id).keys.toSeq.sorted
  }

  /** Drop snapshot DIRECTORIES older than `keep` behind latest, except any
    * directory still referenced as a segment by the latest manifest
    * (append-only history stays live until compacted). Never drops latest,
    * so resume is unaffected — FIXTURES.md §5.
    */
  def expireOldSnapshots(keep: Int = 2): Unit = {
    latestSnapshot.foreach { latest =>
      val live: Set[Long] = manifestOf(latest).values.flatten
        .map(p => Paths.get(p).getParent.getFileName.toString)
        .filter(_.startsWith("snap-"))
        .map(_.stripPrefix("snap-").toLong).toSet
      val s = Files.list(root)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("snap-"))
        .filter { p =>
          val sid = p.getFileName.toString.stripPrefix("snap-").toLong
          sid < latest - keep + 1 && !live.contains(sid)
        }
        .toSeq.foreach(deleteRecursively)
      finally s.close()
    }
  }

  /** Rewrite an append-only table's segments into one (next commit picks it
    * up as the sole segment) — the compaction seam. Returns the compacted
    * DataFrame to pass to the next commit's `tables` map.
    */
  def compacted(spark: SparkSession, name: String): DataFrame =
    read(spark, name)

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.toSeq.foreach(deleteRecursively)
      finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
