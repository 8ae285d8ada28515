package graft.router

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** What a routed handler does with a fetched 200 page — the batch-columnar
  * re-expression of the reference's per-request handler callback: the
  * engine dispatches WHOLE COLUMNS of fetched rows through the handler
  * table instead of invoking a coroutine per request, so dispatch stays
  * inside the Spark plan (a small `when`-chain / broadcast lookup on the
  * `label` column) and scales with the batch, not the request count.
  *
  * `tag` is the observable dispatch record (which handler ran, per
  * request); `extractLinks`/`linkLabel` drive the enqueue pipeline for the
  * handler's rows (the reference handler's `enqueue_links(label=...)`
  * call); `emitImages` is the push-data surface.
  */
final case class PageHandler(
    tag: String,
    extractLinks: Boolean = true,
    linkLabel: Option[String] = None,
    emitImages: Boolean = true
) extends Serializable

/** Per-label request dispatch (reference router.py:20-121).
  *
  * Registration semantics ported exactly: one handler per label, duplicate
  * label registration is an error (router.py:90-94), one default handler
  * (router.py:69-80), and dispatch falls back to the default for a missing
  * or unmatched label — no default + unmatched label is an error at
  * dispatch time (router.py:113-121).
  */
final class Router extends Serializable {

  private val handlersByLabel = mutable.LinkedHashMap.empty[String, PageHandler]
  private var default: Option[PageHandler] = None

  /** Register a handler for an exact label (router.py:82-99). */
  def handler(label: String, h: PageHandler): this.type = {
    if (handlersByLabel.contains(label))
      throw new IllegalStateException(s"A handler for label `$label` is already registered")
    handlersByLabel(label) = h
    this
  }

  /** Register the default handler (router.py:69-80). */
  def defaultHandler(h: PageHandler): this.type = {
    if (default.isDefined)
      throw new IllegalStateException("A default handler is already configured")
    default = Some(h)
    this
  }

  /** Dispatch: exact label match, else the default (router.py:113-121). */
  def resolve(label: Option[String]): PageHandler =
    label.flatMap(handlersByLabel.get).orElse(default).getOrElse(
      throw new IllegalStateException(
        s"No handler matches label `${label.orNull}` and no default handler is configured"))

  def registeredLabels: Seq[String] = handlersByLabel.keys.toSeq
  def hasDefault: Boolean = default.isDefined

  // --- columnar dispatch -----------------------------------------------------
  // The handler table is tiny (a few labels), so dispatch over a batch of
  // fetched rows compiles to a `when`-chain on the `label` column — fully
  // inside whole-stage codegen, no UDF, no lookup broadcast. An unmatched
  // label with no default raises at execution time, mirroring the reference's
  // dispatch error (router.py:113-121).

  private def chain(label: Column, value: PageHandler => Column): Column = {
    val miss: Column = default match {
      case Some(d) => value(d)
      case None =>
        raise_error(concat(
          lit("No handler matches label `"), coalesce(label, lit("null")),
          lit("` and no default handler is configured")))
    }
    handlersByLabel.foldRight(miss) { case ((lbl, h), acc) =>
      when(label === lit(lbl), value(h)).otherwise(acc)
    }
  }

  /** Which handler tag runs for each row's label. */
  def tagCol(label: Column): Column = chain(label, h => lit(h.tag))

  /** Whether the matched handler extracts + enqueues links. */
  def extractLinksCol(label: Column): Column = chain(label, h => lit(h.extractLinks))

  /** The matched handler's default `enqueue_links(label=...)` value. */
  def linkLabelCol(label: Column): Column =
    chain(label, h => h.linkLabel.map(lit(_)).getOrElse(lit(null).cast("string")))

  /** Whether the matched handler pushes image data. */
  def emitImagesCol(label: Column): Column = chain(label, h => lit(h.emitImages))
}
