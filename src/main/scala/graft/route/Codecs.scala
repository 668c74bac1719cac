package graft.route

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output codecs — the serialization step between routing and a sink,
  * mirroring libbeat's codec registry (outputs/codec/codec.go):
  *
  *  - `json`:   one JSON document per event (outputs/codec/json/json.go:66-150;
  *              UTC RFC-3339 timestamps come from the session timezone, the
  *              `pretty` knob maps straight through)
  *  - `format`: one fmtstr-rendered line per event
  *              (outputs/codec/format/format.go:52-80) using the same
  *              compiled [[FmtStr]] tree as the output selector
  *
  * Both produce a single `value` string column — the shape every line/byte
  * sink (file, console, kafka value) consumes — so a sink write is
  * `codec(df).write.text(path)` with zero per-row driver involvement.
  */
object Codecs {

  /** json codec: serialize all (or selected) columns to one JSON doc/row. */
  def json(df: DataFrame, pretty: Boolean = false, cols: Seq[String] = Nil): DataFrame = {
    val fields = (if (cols.isEmpty) df.columns.toSeq else cols).map(col)
    val opts = if (pretty) Map("pretty" -> "true") else Map.empty[String, String]
    df.select(to_json(struct(fields: _*), opts).as("value"))
  }

  /** format codec: render each event through an fmtstr pattern. An event
    * whose render null-propagates (a referenced field is null) is DROPPED,
    * like the reference codec's encode-error path
    * (libbeat/outputs/codec/format) — a newline-framed sink must never
    * emit a phantom empty record. */
  def format(df: DataFrame, pattern: String, tsCol: Column = col("ts")): DataFrame =
    df.select(FmtStr.compile(pattern, tsCol = tsCol).as("value"))
      .filter(col("value").isNotNull)
}
