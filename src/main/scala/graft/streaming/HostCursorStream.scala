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
  * ord set grows with the host's total retractions, which the crawl spec
  * bounds by revisions × window-K — the same rare-event envelope class the
  * reference bounds by its 128-deep reorg window.
  */
object HostCursorStream {

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
    * order across a shuffle is meaningless).
    */
  def advance(s: CursorState, events: Seq[(String, Long)]): CursorState = {
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
    st.copy(retractedOrds = dropped.toArray.sorted)
  }

  /** envelopes (streaming or batch Dataset with host/status/ord) →
    * one CursorUpdate per host per micro-batch.
    */
  def hostCursor(envelopes: DataFrame): Dataset[CursorUpdate] = {
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
          val st = advance(st0, it.map(e => (e._2, e._3)).toSeq)
          state.update(st)
          Iterator.single(CursorUpdate(host, st.headOrd, st.committed,
            st.retracted, st.duplicates))
      }
  }
}
