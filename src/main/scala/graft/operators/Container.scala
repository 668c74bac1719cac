package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ContainerLine
import org.apache.spark.sql.graft.{interop => ExpressionUtils}

/** The `container` input's read pipeline (filebeat/input/container +
  * libbeat/reader/readjson/docker_json.go Next(), :215-246), columnar:
  * per-line decode → drop undecodable lines → join partial runs into whole
  * messages → stream filter. Reference semantics mirrored exactly:
  *
  *  - a message = a maximal run of partial lines closed by the first full
  *    line (in file order, over the SURVIVING lines — undecodable lines in
  *    the middle of a run are skipped and the join continues, like the
  *    reader's `continue`);
  *  - the emitted timestamp/stream/attrs are the FIRST piece's (the reader
  *    mutates its first Message in place and only appends content);
  *  - the stream FILTER tests the LAST piece's stream (the reader's
  *    `logLine` is overwritten by every parse; the post-join check reads
  *    the final state — an asymmetry the reference has, kept on purpose);
  *  - a trailing run never closed by a full line is NOT emitted (the
  *    reader returns it with the read error and the input drops it).
  *
  * Scale shape: one per-file ordered window + one groupBy — the same
  * per-key ordered-fold class as the multiline reader, bounded by file
  * segment length (BASELINE.md hot-key note applies).
  */
object Container {

  /** decode column: `container_line(line)` struct. */
  def line(c: Column, format: String = "auto", criFlags: Boolean = true): Column =
    ExpressionUtils.column(ContainerLine(ExpressionUtils.expression(c), format, criFlags))

  /** full read pipeline over `df(fileCol, orderCol, lineCol)`. Output: one
    * row per assembled message with the first piece's identity fields. */
  def assemble(df: DataFrame, fileCol: String, orderCol: String, lineCol: String,
               stream: String = "all", format: String = "auto",
               criFlags: Boolean = true, joinPartial: Boolean = true): DataFrame = {
    val parsed = df
      .withColumn("_c", line(col(lineCol), format, criFlags))
      .where(col("_c.valid"))
    val ord = Window.partitionBy(fileCol).orderBy(orderCol)
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // a message starts where the previous surviving line was full (or at
    // the head of the file); with partial-joining off, every line stands
    // alone (docker_json.go Next() only loops `for p.partial && …`)
    val boundary =
      if (joinPartial)
        when(coalesce(!lag(col("_c.partial"), 1).over(ord), lit(true)), 1).otherwise(0)
      else lit(1)
    val msgs = parsed
      .withColumn("_start", boundary)
      .withColumn("_g", sum(col("_start")).over(cum))
      .groupBy(col(fileCol), col("_g"))
      .agg(
        min_by(struct(col(orderCol).as("o"), col("_c.ts").as("ts"),
          col("_c.stream").as("stream"), col("_c.attrs").as("attrs"),
          col("_c.format").as("format")), col(orderCol)).as("_first"),
        max_by(struct(col("_c.partial").as("partial"),
          col("_c.stream").as("stream")), col(orderCol)).as("_last"),
        array_join(transform(
          sort_array(collect_list(struct(col(orderCol).as("o"),
            col("_c.content").as("content")))),
          p => p.getField("content")), "").as("message"),
        count(lit(1)).as("n_pieces"))
    // unterminated tail run → dropped; with joining OFF a partial line is
    // a complete message by itself (the reference's join loop simply never
    // runs: `for p.partial && logLine.Partial`)
    val closed = if (joinPartial) msgs.where(!col("_last.partial")) else msgs
    val filtered =
      if (stream == "all") closed
      else closed.where(col("_last.stream") === stream)
    filtered.select(
      col(fileCol),
      col("_first.o").as("first_" + orderCol),
      col("_first.format").as("format"),
      col("_first.ts").as("ts"),
      col("_first.stream").as("stream"),
      col("_first.attrs").as("attrs"),
      col("message"),
      col("n_pieces"))
  }
}
