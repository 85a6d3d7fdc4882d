package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-host cursor: the consumer-side restatement of the
  * reference's checkpointed high-water mark (the `StateFile` cursor,
  * /root/reference/state/state.go) as CUSTOM STREAMING STATE
  * (`flatMapGroupsWithState` over a `KeyValueGroupedDataset`) rather than a
  * windowed aggregate.
  *
  * The producer side is at-least-once (emit before checkpoint save,
  * SURVEY.md §2.9): a crash between emit and snapshot re-emits the whole
  * round on resume. This operator makes the READ side effect-idempotent —
  * BOTH envelope kinds are replay-safe:
  *  - an ACCEPTED envelope at or below the host's committed high-water ord
  *    is a replay and counts as a duplicate, not a commit;
  *  - a DROPPED envelope for an ord already retracted is a replay and
  *    counts as a duplicate, not a second retraction (an ord is committed
  *    once and retracted at most once — next_ord is monotone — so the set
  *    of retracted ords classifies replays exactly).
  *
  * State is keyed by host. The high-water/counters are O(1); the retracted
  * ord set is PRUNED below a low-water mark of
  * headOrd − [[PruneSlackWindows]] × windowK, keeping per-host state
  * O(windowK) for the crawl's lifetime (the reference bounds the analogous
  * structure with its fixed 128-deep window, /root/reference/cache/stack.go
  * — an unbounded set would grow with total revisions forever). Sound
  * because a retraction can only target an ord inside the producer's K-deep
  * window, and a DROPPED replay arrives during the producer's re-emit of
  * one crashed round — by which point the head has advanced at most one
  * round past the retracted ord, far inside the slack. A replay older than
  * the slack would misclassify as a fresh retraction; the producer contract
  * (at-least-once = immediate re-emit on restart) makes that unreachable.
  */
object HostCursorStream {

  /** How many window-depths below the high-water mark retracted ords are
    * remembered before pruning.
    */
  val PruneSlackWindows = 8L

  final case class CursorState(headOrd: Long, committed: Long,
      retracted: Long, duplicates: Long, retractedOrds: Array[Long]) {
    // Array for the encoder; set semantics in `advance`
    def retractedSet: Set[Long] = retractedOrds.toSet
  }

  object CursorState {
    val empty: CursorState = CursorState(0L, 0L, 0L, 0L, Array.emptyLongArray)
  }

  final case class CursorUpdate(host: String, head_ord: Long,
      n_committed: Long, n_retracted: Long, n_duplicates: Long)

  /** Apply one batch of (status, ord) events to a host's cursor state.
    * Events are applied in ord order (commit order within the batch is
    * re-imposed by sort, exactly like the engine's rank join — arrival
    * order across a shuffle is meaningless). Retracted ords below the
    * low-water mark are pruned at batch end, bounding state at O(windowK).
    */
  def advance(s: CursorState, events: Seq[(String, Long)],
      windowK: Int = 128): CursorState = {
    var st = s
    var dropped = s.retractedSet
    events.sortBy(_._2).foreach { case (status, ord) =>
      status match {
        case "ACCEPTED" =>
          if (ord > st.headOrd)
            st = st.copy(headOrd = ord, committed = st.committed + 1)
          else st = st.copy(duplicates = st.duplicates + 1)
        case "DROPPED" =>
          if (dropped.contains(ord))
            st = st.copy(duplicates = st.duplicates + 1)
          else {
            dropped = dropped + ord
            st = st.copy(retracted = st.retracted + 1)
          }
        case _ => ()
      }
    }
    val lowWater = st.headOrd - PruneSlackWindows * windowK
    st.copy(retractedOrds = dropped.filter(_ >= lowWater).toArray.sorted)
  }

  /** envelopes (streaming or batch Dataset with host/status/ord) →
    * one CursorUpdate per host per micro-batch. `windowK` is the producer's
    * revision-window depth, which bounds this operator's retracted-ord state.
    */
  def hostCursor(envelopes: DataFrame, windowK: Int = 128): Dataset[CursorUpdate] = {
    val spark = envelopes.sparkSession
    import spark.implicits._
    envelopes
      .select(col("host"), col("status"), col("ord"))
      .filter(col("ord").isNotNull)
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (host: String, it: Iterator[(String, String, Long)],
            state: GroupState[CursorState]) =>
          val st0 = state.getOption.getOrElse(CursorState.empty)
          val st = advance(st0, it.map(e => (e._2, e._3)).toSeq, windowK)
          state.update(st)
          Iterator.single(CursorUpdate(host, st.headOrd, st.committed,
            st.retracted, st.duplicates))
      }
  }
}
