package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** The reference's `actions` processor family (libbeat/processors/actions)
  * re-expressed as declarative Column transforms. Every operator here is a
  * narrow, codegen'd projection — zero shuffle, linear scale; the only wide
  * operators are [[rateLimit]] (window over the key) and [[sessionize]]
  * (groupBy conv) and both shuffle only their grouping key + payload once.
  *
  * Row-level error semantics follow the reference: failures never kill the
  * job, they null the target or tag the row (processor.go:131-144 — group
  * level logs-and-continues).
  */
object Actions {

  /** add_fields (actions/add_fields.go:74-86): constant columns. */
  def addFields(df: DataFrame, fields: Map[String, Column]): DataFrame =
    fields.foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) }

  /** add_tags (actions/add_tags.go:75-82): append + dedup, order-stable via
    * sort (common.AddTagsWithKey dedups; we sort for engine-independence). */
  def addTags(tags: Column, added: Seq[String]): Column =
    array_sort(array_union(tags, array(added.map(lit): _*)))

  /** copy_fields (actions/copy_fields.go:71-100). */
  def copyField(df: DataFrame, src: String, dst: String): DataFrame =
    df.withColumn(dst, col(src))

  /** rename (actions/rename.go:75-108): fails at plan time if target exists
    * (reference fails at run time per event). */
  def renameField(df: DataFrame, src: String, dst: String): DataFrame = {
    require(!df.columns.contains(dst), s"rename target exists: $dst")
    df.withColumnRenamed(src, dst)
  }

  /** replace (actions/replace.go:75-118): regex substitution. */
  def replaceField(c: Column, pattern: String, replacement: String): Column =
    regexp_replace(c, pattern, replacement)

  /** truncate_fields (actions/truncate_fields.go:84-140), char variant. */
  def truncateField(c: Column, maxChars: Int): Column =
    substring(c, 1, maxChars)

  /** convert (convert/convert.go:74-115): safe cast — null on failure
    * (mirrors fail_on_error=false + ignore_missing). */
  def convertField(c: Column, to: String): Column = c.cast(to)

  /** timestamp (timestamp/timestamp.go:86-185): first-matching-layout parse. */
  def parseTimestamp(c: Column, formats: Seq[String]): Column =
    coalesce(formats.map(f => try_to_timestamp(c, lit(f))): _*)

  /** fingerprint (fingerprint/fingerprint.go:70-120): sha256 of joined
    * key=value fields, hex. Field order is the config order, join is "|". */
  def fingerprint(cols: Seq[Column]): Column = fingerprint_cols(cols)

  /** decode_base64_field (actions/decode_base64_field.go:76-130). */
  def decodeBase64(c: Column): Column = unbase64(c).cast("string")

  /** decode_json_fields (actions/decode_json_fields.go:103-180) for a flat
    * string→string object — the shape of the ##JIDU## envelopes. */
  def decodeJsonMap(c: Column): Column =
    from_json(c, org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType))

  /** urldecode (urldecode/urldecode.go:75-110). */
  def urlDecode(c: Column): Column = url_decode(c)

  /** decode_csv_fields (decode_csv_fields/decode_csv_fields.go:102-160):
    * RFC-CSV parse of a field into `n` named string columns (quotes and
    * embedded commas handled by the CSV reader, like the reference's
    * encoding/csv). */
  def decodeCsv(c: Column, fieldNames: Seq[String]): Column = {
    val schema = org.apache.spark.sql.types.StructType(
      fieldNames.map(f => org.apache.spark.sql.types.StructField(f,
        org.apache.spark.sql.types.StringType)))
    from_csv(c, schema, Map.empty[String, String])
  }

  /** extract_array (extract_array/extract_array.go:115-170): map array
    * elements to named columns; missing index → null (ignore semantics). */
  def extractArray(df: DataFrame, arrCol: String, mapping: Map[String, Int]): DataFrame =
    mapping.foldLeft(df) { case (d, (name, idx)) =>
      // try_ variant: index past end → null (ANSI element_at would throw)
      d.withColumn(name, try_element_at(col(arrCol), lit(idx + 1))) // reference is 0-based
    }

  /** include/exclude line filters (filebeat harvester.go:498-518). */
  def includeLines(df: DataFrame, textCol: String, pattern: String): DataFrame =
    df.filter(col(textCol).rlike(pattern))
  def excludeLines(df: DataFrame, textCol: String, pattern: String): DataFrame =
    df.filter(!col(textCol).rlike(pattern))

  /** ratelimit (ratelimit/rate_limit.go:102-115), batch analogue: keep the
    * first `limit` events per key in event order; emits per-key kept/dropped
    * tallies (the token-bucket counters). One shuffle on the key. */
  def rateLimitCounts(df: DataFrame, key: String, order: String, limit: Int): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order)
    df.withColumn("_rn", row_number().over(w))
      .groupBy(key)
      .agg(sum(when(col("_rn") <= limit, 1L).otherwise(0L)).as("kept"),
        sum(when(col("_rn") > limit, 1L).otherwise(0L)).as("dropped"))
  }

  /** multiline (libbeat/reader/multiline/pattern.go:68-236) re-expressed as
    * conversation assembly: all turns of a conv folded into one ordered
    * document. groupBy(conv) is ONE shuffle of (key, turn_idx, text);
    * array_sort on the collected structs keeps ordering deterministic without
    * a global sort. At 10^12 turns a hot conv is bounded by turns-per-conv,
    * not corpus size — see Enrich.saltedRepartition for the pathological
    * case. */
  def sessionize(df: DataFrame, sep: String = "\n"): DataFrame =
    df.groupBy("conv_id")
      .agg(
        count(lit(1)).cast("long").as("n_turns"),
        array_join(
          transform(array_sort(collect_list(struct(col("turn_idx"), col("text")))),
            x => x.getField("text")),
          sep).as("session_text"))

  /** multiline folding (libbeat/reader/multiline/pattern.go:68-236,
    * `pattern`+`negate`+`match: after` semantics): a line NOT matching
    * `startPattern` continues the previous event; fold runs of continuation
    * lines into one event per start line. Batch formulation: a per-conv
    * running count of start lines assigns a group id (window cumsum — one
    * shuffle on conv_id, order local to the partition), then an ordered fold
    * per (conv, group). A leading continuation line opens group 0, matching
    * the reference's treatment of a file starting mid-event. */
  def multilineFold(df: DataFrame, startPattern: String): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_start", when(col("text").rlike(startPattern), 1).otherwise(0))
      .withColumn("event_idx", sum(col("_start")).over(w).cast("int"))
      .groupBy("conv_id", "event_idx")
      .agg(
        min("turn_idx").as("first_turn"),
        count(lit(1)).cast("long").as("n_lines"),
        array_join(
          transform(array_sort(collect_list(struct(col("turn_idx"), col("text")))),
            x => x.getField("text")),
          "\n").as("event_text"))
  }

  /** kafka fields-hash partitioner (libbeat/outputs/kafka/partition.go:216-238):
    * FNV-1a-32 of the key, unsigned, mod partition count. */
  def kafkaPartition(key: Column, numPartitions: Int): Column =
    pmod(fnv1a32(key).cast("long").bitwiseAND(lit(4294967295L)), lit(numPartitions.toLong))
      .cast("int")
}
