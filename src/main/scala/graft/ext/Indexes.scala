package graft.ext

/** Shared discipline for the incremental ingest-gate indexes
  * (LshIndex, WinnowIndex, MediaFpIndex, UrlIndex): each `extend*`
  * call pins an O(batch) leg and lazily unions it onto the index, so
  * a gate that runs for months accumulates an O(batches)-deep union
  * plan that every micro-batch probe re-analyzes.  Past [[CompactLegs]]
  * legs the union auto-compacts — re-checkpointed into ONE leg,
  * repartitioned by the index's probe key — paying an O(index) copy
  * once per `CompactLegs` batches (amortized O(index / CompactLegs)
  * per batch) to keep probe-plan depth bounded by a constant.
  * Cross-restart persistence (`save*` / `load*`, bucketed by the probe
  * key) remains the durable form; compaction is the in-session
  * guarantee that nobody has to remember to persist. */
object Indexes {
  val CompactLegs: Int = 16
}
