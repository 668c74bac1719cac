package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** script processor analogue (processors/script/javascript): the reference
  * embeds a JS VM (goja) exposing a per-event mutation API —
  * Get/Put/Rename/Delete/Cancel/Tag/AppendTo (beatevent_v0.go:79-260) — and
  * runs a user `process(event)` function per event from a session pool.
  *
  * No JS engine ships in a modern JVM (Nashorn left in 15) and a per-row
  * script VM is the antithesis of codegen anyway, so the Spark-native
  * analogue keeps the reference's EVENT API verbatim and takes the script as
  * a Scala function: declarative Column logic remains the first-choice path
  * (SURVEY §2.8); this is the arbitrary-imperative escape hatch, executed
  * distributed via `Dataset.map` — per-partition, no driver involvement,
  * cancelled events dropped exactly like the processor's nil return.
  * Scripts must be pure functions of the event (no wall clock, no RNG) so
  * replays and speculative re-execution stay deterministic.
  */
object Script {

  /** the serializable event row: scalar fields + array-valued fields
    * (`AppendTo`/`Tag` targets — the reference converts such fields to
    * arrays, beatevent_v0.go:241-260). */
  final case class Event(fields: Map[String, String],
                         lists: Map[String, Seq[String]])

  /** mutable per-event view handed to the script — the beatEventV0 surface. */
  final class ScriptEvent private[Script] (ev: Event) {
    private val fields = scala.collection.mutable.LinkedHashMap.empty[String, String]
    private val lists = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    fields ++= ev.fields
    ev.lists.foreach { case (k, v) => lists(k) = v.toVector }
    private var cancelled = false

    // fields and lists are ONE namespace (the reference has a single event
    // map — a key must never exist in both shapes at once); the typed API
    // splits storage by shape only.

    /** Get(key) → scalar value, or null when missing or array-valued (use
      * [[getList]] for array fields) (get, :114-135). */
    def get(key: String): String = fields.getOrElse(key, null)

    /** array-field read — the typed accessor for `AppendTo`/`Tag` targets. */
    def getList(key: String): Seq[String] = lists.getOrElse(key, null)

    /** Put(key, value) → previous scalar or null; overwrites, replacing an
      * array-valued key like the reference's map put (put, :137-150).
      * Typed-API divergence (deliberate): the reference's Put returns the
      * previous value whatever its type; this String-typed signature cannot
      * carry a removed array, so replacing an array-valued key returns null —
      * read [[getList]] first when the prior array matters. */
    def put(key: String, value: String): String = {
      lists.remove(key)
      val old = fields.getOrElse(key, null)
      fields(key) = value
      old
    }

    /** Rename(from, to) → success; fails when `to` exists ("fields cannot be
      * overwritten") or `from` is missing (rename, :156-190). */
    def rename(from: String, to: String): Boolean = {
      if (fields.contains(to) || lists.contains(to)) return false
      fields.remove(from) match {
        case Some(v) => fields(to) = v; true
        case None =>
          lists.remove(from) match {
            case Some(v) => lists(to) = v; true
            case None    => false
          }
      }
    }

    /** Delete(key) → success; removes the key whichever shape holds it
      * (delete, :193-205). */
    def delete(key: String): Boolean = {
      val a = fields.remove(key).isDefined
      val b = lists.remove(key).isDefined
      a || b
    }

    /** Cancel(): the event is dropped when the script returns (:213-226). */
    def cancel(): Unit = cancelled = true
    def isCancelled: Boolean = cancelled

    /** Tag(t): append to the `tags` array unless present; an absent `tags`
      * becomes a one-element ARRAY (appendString alwaysArray=true,
      * beatevent_v0.go:236 + :264-268). */
    def tag(t: String): Unit = appendString("tags", t, alwaysArray = true)

    /** AppendTo(field, value): array-converting append, a strict NO-OP when
      * the value is already present — an equal scalar stays scalar, like the
      * reference's appendString skip (appendTo, :248-260). An existing
      * different scalar becomes the array's first element; a fully ABSENT
      * field stores a plain scalar (appendString alwaysArray=false, case nil,
      * beatevent_v0.go:262-270). */
    def appendTo(field: String, value: String): Unit =
      appendString(field, value, alwaysArray = false)

    private def appendString(field: String, value: String,
                             alwaysArray: Boolean): Unit =
      lists.get(field) match {
        case Some(l) =>
          if (!l.contains(value)) lists(field) = l :+ value
        case None =>
          fields.get(field) match {
            case Some(`value`) => // equal scalar stays scalar
            case Some(prev) =>
              fields.remove(field)
              lists(field) = Vector(prev, value)
            case None =>
              if (alwaysArray) lists(field) = Vector(value)
              else fields(field) = value
          }
      }

    private[Script] def result: Event = Event(fields.toMap, lists.toMap)
  }

  /** wrap selected STRING columns of a frame into script events (null values
    * are absent keys, like the reference's missing fields). */
  def events(df: DataFrame, cols: String*): Dataset[Event] = {
    import df.sparkSession.implicits._
    val names = cols.toArray
    df.select(cols.map(c => col(c).cast("string")): _*).map { row =>
      val m = Map.newBuilder[String, String]
      var i = 0
      while (i < names.length) {
        if (!row.isNullAt(i)) m += names(i) -> row.getString(i)
        i += 1
      }
      Event(m.result(), Map.empty)
    }
  }

  /** the processor run: `process` per event, distributed; cancelled events
    * drop (the nil-return contract, processor.go:131-144). */
  def run(ds: Dataset[Event])(process: ScriptEvent => Unit): Dataset[Event] = {
    import ds.sparkSession.implicits._
    ds.flatMap { ev =>
      val se = new ScriptEvent(ev)
      process(se)
      if (se.isCancelled) None else Some(se.result)
    }
  }
}
