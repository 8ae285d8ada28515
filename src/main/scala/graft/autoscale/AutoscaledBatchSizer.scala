package graft.autoscale

import scala.collection.mutable

/** Batch-native autoscaling (SURVEY §2.10 X1-X3) — the reference's
  * AutoscaledPool + Snapshotter + SystemStatus re-expressed for a
  * micro-batch engine, where the unit of concurrency is the CLAIM BATCH
  * SIZE, not a task count:
  *
  *   - desired_concurrency        ≙ desired claim batch size
  *   - snapshotter samples        ≙ recent batch wall times vs the batch
  *     period target (the loop's own lateness is the event-loop overload
  *     analogue, _autoscaling/snapshotter.py event-loop snapshots)
  *   - SystemStatus.is_system_idle ≙ overloaded-sample ratio in the recent
  *     window under the threshold (system_status.py:141-160,
  *     event_loop_overload_threshold = 0.6)
  *   - AutoscaledPool._autoscale  ≙ [[record]] every `autoscaleEvery`
  *     batches: idle AND the last claim filled ≥ desiredRatio of the
  *     desired size -> grow by ceil(5%); overloaded -> shrink by ceil(5%)
  *     (autoscaled_pool.py:184-202, step ratios :56-59, desired ratio :53)
  *
  * A claim that comes back smaller than desiredRatio × desired means the
  * FRONTIER is the constraint (the reference's current_concurrency <
  * minimum gate) — growing the batch would change nothing, so we don't.
  */
final class AutoscaledBatchSizer(
    val minBatch: Int,
    val maxBatch: Int,
    initial: Int,
    scaleUpStepRatio: Double = 0.05,
    scaleDownStepRatio: Double = 0.05,
    desiredRatio: Double = 0.9,
    overloadThreshold: Double = 0.6,
    autoscaleEvery: Int = 3,
    historySize: Int = 30
) extends Serializable {

  require(minBatch >= 1 && maxBatch >= minBatch && initial >= minBatch && initial <= maxBatch)

  private var _desired: Int = initial
  private var sinceAutoscale = 0
  private var lastClaimed = 0L
  // ring of (wall > target) overload flags — the snapshotter sample window
  private val samples = mutable.Queue.empty[Boolean]

  def desired: Int = _desired

  /** Ratio of overloaded samples in the window (system_status.py:141-160). */
  def overloadedRatio: Double =
    if (samples.isEmpty) 0.0 else samples.count(identity).toDouble / samples.size

  def isSystemIdle: Boolean = overloadedRatio < overloadThreshold

  /** Record one finished batch; runs the autoscale step every
    * `autoscaleEvery` batches (the reference's 10 s AUTOSCALE_INTERVAL
    * against a 1 s batch period would be every ~10 batches; tests use a
    * shorter cadence).
    */
  def record(claimed: Long, wallMs: Long, targetMs: Long): Unit = {
    samples.enqueue(wallMs > targetMs)
    if (samples.size > historySize) samples.dequeue()
    lastClaimed = claimed
    sinceAutoscale += 1
    if (sinceAutoscale >= autoscaleEvery) {
      sinceAutoscale = 0
      autoscale()
    }
  }

  private def autoscale(): Unit = {
    val minCurrent = math.floor(desiredRatio * _desired).toLong
    val shouldScaleUp = isSystemIdle && _desired < maxBatch && lastClaimed >= minCurrent
    val shouldScaleDown = !isSystemIdle && _desired > minBatch
    if (shouldScaleUp) {
      val step = math.ceil(scaleUpStepRatio * _desired).toInt
      _desired = math.min(maxBatch, _desired + step)
    } else if (shouldScaleDown) {
      val step = math.ceil(scaleDownStepRatio * _desired).toInt
      _desired = math.max(minBatch, _desired - step)
    }
  }
}
