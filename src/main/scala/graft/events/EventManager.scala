package graft.events

import scala.collection.mutable

/** Crawler event bus (SURVEY §2.10 X6) — the reference EventManager
  * (events/_event_manager.py:50-230): named events with registerable /
  * removable listeners, emitted synchronously at well-defined points of
  * the crawl lifecycle. Batch-native re-expression: the reference emits
  * PERSIST_STATE on a timer and SYSTEM_INFO from the snapshotter; here
  * both ride batch boundaries (PERSIST_STATE on the metrics-flush cadence,
  * SYSTEM_INFO once per batch with the batch wall time), which are this
  * engine's only coherent commit points.
  */
object Event extends Enumeration {
  /** periodic state-persistence tick (reference Event.PERSIST_STATE) */
  val PersistState,
  /** per-batch load snapshot (reference Event.SYSTEM_INFO) */
  SystemInfo,
  /** cooperative stop / abort_on_error fired (reference Event.ABORTING) */
  Aborting,
  /** crawl finished, final state persisted (reference Event.EXIT) */
  Exit = Value
}

final class EventManager extends Serializable {

  private val listeners =
    mutable.LinkedHashMap.empty[Event.Value, mutable.ArrayBuffer[Any => Unit]]

  /** Register a listener (reference on(), _event_manager.py:148-175). */
  def on(event: Event.Value)(listener: Any => Unit): Any => Unit = {
    listeners.getOrElseUpdate(event, mutable.ArrayBuffer.empty) += listener
    listener
  }

  /** Remove one listener, or ALL listeners for the event when none given
    * (reference off(), _event_manager.py:177-196).
    */
  def off(event: Event.Value, listener: Option[Any => Unit] = None): Unit =
    listener match {
      case Some(l) => listeners.get(event).foreach(_.filterInPlace(_ ne l))
      case None => listeners.remove(event)
    }

  def listenerCount(event: Event.Value): Int = listeners.get(event).map(_.size).getOrElse(0)

  /** Emit synchronously to every registered listener in registration
    * order; a listener failure does not stop the others (the reference
    * logs and continues, _event_manager.py:198-214).
    */
  def emit(event: Event.Value, data: Any = null): Unit =
    listeners.get(event).foreach(_.toSeq.foreach { l =>
      try l(data)
      catch { case _: Exception => () }
    })
}
