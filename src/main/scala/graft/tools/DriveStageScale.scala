package graft.tools

/** Diagnostic: per-phase frontier-round times at both gate levels (pinned
  * child JVMs, same layout as the bench). Identifies which phase fails to
  * scale 2→8 cores — the Amdahl term behind the gate margin.
  */
object DriveStageScale {
  def main(a: Array[String]): Unit = {
    val n = a.headOption.map(_.toLong).getOrElse(3000000L)
    val reps = a.drop(1).headOption.map(_.toInt).getOrElse(2)
    graft.Bench.frontierPhaseDiag(2, n, reps)
    graft.Bench.frontierPhaseDiag(8, n, reps)
  }
}
