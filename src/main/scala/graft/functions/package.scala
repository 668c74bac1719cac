package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{interop => ExpressionUtils}

/** Public column API for graft's custom Catalyst expressions, plus small
  * composition helpers mirroring reference operators that map to built-ins.
  */
package object functions {

  /** serverlog parse (fork parse_serverlog semantics) → struct column. */
  def serverlog_parse(text: Column): Column =
    ExpressionUtils.column(ServerlogParse(ExpressionUtils.expression(text)))

  /** status-only serverlog evaluation (allocation-free routing fast path). */
  def serverlog_status(text: Column): Column =
    ExpressionUtils.column(ServerlogStatus(ExpressionUtils.expression(text)))

  /** one-pass compiled-regex extraction of all groups → struct column. */
  def grok_struct(text: Column, pattern: String, fields: Seq[String]): Column =
    ExpressionUtils.column(GrokStruct(ExpressionUtils.expression(text), pattern, fields))

  /** dissect positional tokenizer → struct column (null struct on miss);
    * trim modes per the reference's processor config (trim.go). */
  def dissect(text: Column, pattern: String,
              trimMode: Dissect.TrimMode = Dissect.TrimNone,
              trimChars: String = " "): Column =
    ExpressionUtils.column(
      DissectExpr(ExpressionUtils.expression(text), pattern, trimMode, trimChars))

  /** dissect with the full modifier set (indirect/pointer dynamic keys, trim
    * modes) → map<string,string> column (null map on miss). */
  def dissect_map(text: Column, pattern: String,
                  trimMode: Dissect.TrimMode = Dissect.TrimNone,
                  trimChars: String = " "): Column =
    ExpressionUtils.column(
      DissectMapExpr(ExpressionUtils.expression(text), pattern, trimMode, trimChars))

  /** syslog line parse (RFC3164 lenient / RFC5424 strict / auto-detected
    * per row via the reference's format probe) → typed struct column
    * (filebeat/input/syslog). `defaultYear` fills classic 3164 timestamps'
    * missing year; `defaultTzSeconds` applies when a line carries no offset. */
  def parse_syslog(text: Column, format: String = "auto",
                   defaultYear: Int = 2024, defaultTzSeconds: Int = 0): Column =
    ExpressionUtils.column(SyslogParse(
      ExpressionUtils.expression(text), format, defaultYear, defaultTzSeconds))

  /** decode_cef: ArcSight CEF line → typed struct with full-named, type-
    * validated extensions (x-pack decode_cef semantics; null struct when no
    * CEF header). */
  def decode_cef(text: Column): Column =
    ExpressionUtils.column(DecodeCef(ExpressionUtils.expression(text)))

  /** Gopher-style word n-gram repetition metrics → struct(top_gram,
    * top_frac, dup_frac) over the normalized text (LLM data-quality
    * filters; Rae et al. 2021 Table A1). */
  def ngram_char_fracs(text: Column, n: Int): Column =
    ExpressionUtils.column(NgramCharFracs(ExpressionUtils.expression(text), n))

  /** tokenizer-real BPE apply: array of words → per-word subword arrays
    * under a merge-rank table carried as ONE reference object (table-size-
    * independent per-word cost; see [[BpeKernel]] for the rank-consistency
    * precondition every trained table satisfies). */
  def bpe_encode_words(words: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeEncodeWords(ExpressionUtils.expression(words), merges))

  /** network condition leaf: IP-string column ∈ any of the named networks /
    * CIDRs (conditions/network.go). */
  def ip_in_networks(ip: Column, networks: Seq[String]): Column =
    ExpressionUtils.column(IpInNetworks(ExpressionUtils.expression(ip), networks))

  /** add_network_direction: classify src/dst against internal networks →
    * internal|external|inbound|outbound (add_network_direction.go:66-120). */
  def network_direction(src: Column, dst: Column, internal: Seq[String]): Column =
    ExpressionUtils.column(NetworkDirection(
      ExpressionUtils.expression(src), ExpressionUtils.expression(dst), internal))

  /** Community ID v1 flow hash (processors/communityid, flowhash spec); for
    * ICMP protocols the port arguments carry (type, code). */
  def community_id(srcIp: Column, dstIp: Column, srcPort: Column,
                   dstPort: Column, protocol: Column, seed: Int = 0): Column =
    ExpressionUtils.column(CommunityId(ExpressionUtils.expression(
      struct(srcIp, dstIp, srcPort.cast("int"), dstPort.cast("int"),
        protocol.cast("int"))), seed))

  /** level-letter → long-name translation via a map literal
    * (libbeat/processors/parse_common/parser.go:34-42); unknown letters pass
    * through, like the reference's `else` branch (parse_vehicle_trace2trace
    * parser.go:140-144). */
  def level_translate(level: Column): Column = {
    val entries = graft.model.Lookups.LevelMap.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    // try_element_at: strict element_at THROWS on a missing map key under
    // ANSI mode, breaking the documented unknown-letter pass-through
    coalesce(try_element_at(map(entries: _*), level), level)
  }

  /** sha2(s, 256) drop-in with a thread-local digest (no per-row
    * MessageDigest construction); output identical, pinned by spec. */
  def sha256_hex(s: Column): Column =
    ExpressionUtils.column(DigestHex(ExpressionUtils.expression(s), "SHA-256"))

  /** lowercase hex digest for any JDK algorithm — the fingerprint
    * processor's method set (fingerprint/hash.go:33-40). */
  def digest_hex(s: Column, algo: String): Column =
    ExpressionUtils.column(DigestHex(ExpressionUtils.expression(s), algo))

  /** hex digest of one string column under the fingerprint processor's
    * method vocabulary (fingerprint/hash.go:33-41): md5 | sha1 | sha256 |
    * sha384 | sha512 | xxhash. xxhash is the from-spec XXH64 seed-0 kernel
    * ([[Xxh64Kernel]]) — bit-identical to the reference's Go
    * `cespare/xxhash` (golden vectors pinned in ActionsSpec). */
  def method_digest(joined: Column, method: String): Column = method match {
    case "md5"    => digest_hex(joined, "MD5")
    case "sha1"   => digest_hex(joined, "SHA-1")
    case "sha256" => digest_hex(joined, "SHA-256")
    case "sha384" => digest_hex(joined, "SHA-384")
    case "sha512" => digest_hex(joined, "SHA-512")
    case "xxhash" =>
      ExpressionUtils.column(Xxh64Hex(ExpressionUtils.expression(joined)))
    case m => throw new IllegalArgumentException(s"unknown fingerprint method: $m")
  }

  /** fingerprint of selected columns (≈ processors/fingerprint: hash of
    * joined fields, hex-encoded — fingerprint/fingerprint.go:70-120).
    * `method` mirrors the reference's config values (fingerprint/hash.go).
    * The joined layout here is value-only `a|b|c`; for byte-parity with the
    * reference's `|key|value|…|` encoding use [[fingerprint_fields]].
    * Null fields encode as a U+0000 sentinel — concat_ws would silently SKIP
    * them (with their separators), colliding `(a, null, c)` with `(a, c)`. */
  def fingerprint_cols(cols: Seq[Column], method: String = "sha256"): Column =
    method_digest(concat_ws("|",
      cols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*), method)

  /** exact reference fingerprint: named fields, sorted+deduped by name
    * (fingerprint.go:55-58 MakeStringSet.ToSlice), encoded `|k|v` per field
    * with a trailing `|` (fingerprint.go:91-115 writeFields) — bit-identical
    * output to the reference processor for every hash method, pinned against
    * fingerprint_test.go:95-101's golden vectors in ActionsSpec. */
  def fingerprint_fields(fields: Seq[(String, Column)],
                         method: String = "sha256"): Column = {
    val parts = fields.distinctBy(_._1).sortBy(_._1).flatMap {
      case (k, v) => Seq(lit(s"|$k|"), v.cast("string"))
    } :+ lit("|")
    method_digest(concat(parts: _*), method)
  }

  /** strict IP-literal validation (Go net.ParseIP semantics) — the convert
    * processor's `type: ip` check (convert/convert.go transformType) and the
    * dissect `|ip` suffix share this validator. */
  def is_valid_ip(s: Column): Column =
    ExpressionUtils.column(IsValidIp(ExpressionUtils.expression(s)))

  /** deterministic document id (≈ add_id, but replay-idempotent by design:
    * derived from identity columns, not random — add_id/add_id.go:64-90). */
  def deterministic_id(convId: Column, turnIdx: Column): Column =
    sha256_hex(concat_ws("#", convId, turnIdx.cast("string")))

  /** 64-bit SimHash of a token array (near-dup sketching). */
  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))

  /** k-wide MinHash signature (array<long>) of a shingle array. */
  def minhash_sig(shingles: Column, k: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(shingles), k))

  /** exact shingle-set Jaccard counts packed `(inter << 32) | union`. */
  def shingle_jaccard_packed(aTokens: Column, bTokens: Column, w: Int): Column =
    ExpressionUtils.column(ShingleJaccardPacked(
      ExpressionUtils.expression(aTokens), ExpressionUtils.expression(bTokens), w))

  /** banded-LSH bucket keys (array<long>, one per band) straight from a
    * token array — one kernel pass, no shingle materialization. */
  def minhash_bands_tokens(tokens: Column, w: Int, k: Int, bands: Int): Column =
    ExpressionUtils.column(
      MinHashBandsTokens(ExpressionUtils.expression(tokens), w, k, bands))

  /** cosine similarity of two array<float> embedding columns (double). */
  def cosine_sim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSim(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** random-hyperplane LSH bucket id for an embedding column; `seed` selects
    * one of L independent hash tables (multi-table LSH). */
  def hyperplane_bucket(vec: Column, planes: Int, seed: Int = 0): Column =
    ExpressionUtils.column(HyperplaneBucket(ExpressionUtils.expression(vec), planes, seed))

  /** FNV-1a 32-bit hash (reference kafka partitioner hash). */
  def fnv1a32(s: Column): Column =
    ExpressionUtils.column(Fnv1a32(ExpressionUtils.expression(s)))

  /** nprobe nearest IVF centroids (embedded matrix, no shuffle). */
  def nearest_centroids(vec: Column, centroids: Array[Array[Float]], nprobe: Int): Column =
    ExpressionUtils.column(NearestCentroids(ExpressionUtils.expression(vec), centroids, nprobe))

  /** product-quantization encode: embedding → m subspace codes (array<int>). */
  def pq_encode(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    ExpressionUtils.column(PqEncode(ExpressionUtils.expression(vec), codebooks))

  /** per-query PQ ADC dot table (flat m×ksub floats, ‖q‖-normalized). */
  def pq_dot_table(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    ExpressionUtils.column(PqDotTable(ExpressionUtils.expression(vec), codebooks))

  /** ADC approximate cosine from codes + a query's dot table. */
  def pq_adc_score(codes: Column, table: Column, norm2: Array[Double],
                   ksub: Int): Column =
    ExpressionUtils.column(PqAdcScore(ExpressionUtils.expression(codes),
      ExpressionUtils.expression(table), norm2, ksub))

  /** bounded ordered collect: values of the k smallest `ord` rows, sorted —
    * the skew-safe (hot-conversation-proof) replacement for
    * `array_sort(collect_list(...))`; see [[OrderedTopKStrings]]. */
  def ordered_topk(ord: Column, value: Column, k: Int): Column =
    ExpressionUtils.column(OrderedTopKStrings(
      ExpressionUtils.expression(ord), ExpressionUtils.expression(value), k)
      .toAggregateExpression())

  /** bounded best-k by (score desc, id asc) → sorted
    * array<struct<neighbor_id,cos>> — the skew-safe per-query top-k for the
    * ANN paths (constant memory per group, map-side combinable); see
    * [[TopKByScore]]. */
  def topk_by_score(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(TopKByScore(
      ExpressionUtils.expression(score), ExpressionUtils.expression(id), k)
      .toAggregateExpression())

  /** gunzip a binary column (decompress_gzip_field.go:69-133); null on
    * corrupt stream. */
  def gunzip(bin: Column): Column =
    ExpressionUtils.column(GzipDecompress(ExpressionUtils.expression(bin)))

  /** magic-byte MIME sniff (detect_mime_type.go:54-75). */
  def detect_mime(bin: Column): Column =
    ExpressionUtils.column(DetectMime(ExpressionUtils.expression(bin)))

  /** fixed-config raw-DEFLATE byte length (compression-ratio signal). */
  def deflate_len(bin: Column): Column =
    ExpressionUtils.column(DeflateLen(ExpressionUtils.expression(bin)))

  /** byte-capped UTF-8 truncation (truncate_fields max_bytes variant). */
  def truncate_utf8_bytes(s: Column, maxBytes: Int): Column =
    ExpressionUtils.column(TruncateUtf8Bytes(ExpressionUtils.expression(s), maxBytes))

  /** decode_xml_fields → flattened map<string,string> of dotted leaf paths
    * (decode_xml + common/encoding/xml/decode.go); null on malformed XML. */
  def decode_xml_map(xml: Column, toLower: Boolean = false): Column =
    ExpressionUtils.column(XmlToMap(ExpressionUtils.expression(xml), toLower))

  /** container-log line decode (reader/readjson/docker_json.go): docker
    * JSON / CRI / auto per line → typed struct; undecodable → valid=false. */
  def container_line(line: Column, format: String = "auto",
                     criFlags: Boolean = true): Column =
    ExpressionUtils.column(ContainerLine(ExpressionUtils.expression(line), format, criFlags))

  /** decode_xml_wineventlog (x-pack winlogbeat projection, processors/
    * decode_xml_wineventlog + winlogbeat/sys/winevent/event.go:93-155):
    * Windows-event XML → typed `winlog` struct; NULL on undecodable input. */
  def decode_wineventlog(xml: Column): Column =
    ExpressionUtils.column(DecodeWinEventLog(ExpressionUtils.expression(xml)))

  /** registered_domain (processors/registered_domain): eTLD+1 via the Public
    * Suffix List algorithm over a plan-time-compiled rule set; NULL for
    * malformed domains and for domains that ARE a public suffix. */
  def registered_domain(domain: Column,
                        rules: Seq[String] = PslKernel.FullRules): Column =
    ExpressionUtils.column(RegisteredDomain(ExpressionUtils.expression(domain), rules))

  /** registered_domain against a downloaded publicsuffix.org list file, read
    * once at plan time (the deployment path for the real ~9k-rule list). */
  def registered_domain_from_file(domain: Column, rulesFile: String): Column =
    registered_domain(domain, PslKernel.loadRules(rulesFile))

  /** membership-count of an array&lt;bigint&gt; of gram hashes against a fixed
    * sorted set carried inside the expression → `(n_grams, hits)`; the
    * join-free decontamination kernel. */
  def ngram_set_hits(gramHashes: Column, sortedSet: Array[Long]): Column =
    ExpressionUtils.column(
      NgramSetHits(ExpressionUtils.expression(gramHashes), sortedSet))

  /** might-contain count of an array&lt;bigint&gt; of gram hashes against a
    * serialized `util.sketch.BloomFilter` → `(n_grams, bloom_hits)`; zero
    * bloom hits proves zero true hits (no false negatives). */
  def ngram_bloom_hits(gramHashes: Column, bfBytes: Array[Byte]): Column =
    ExpressionUtils.column(
      NgramBloomHits(ExpressionUtils.expression(gramHashes), bfBytes))

  /** TCP-stream frame split (inputsource/common/streaming/scan.go): RFC6587
    * octet-counting + non-transparent framing per frame (the syslog input's
    * `framing: rfc6587`), or pure custom-delimiter framing with
    * `rfc6587 = false` (`FactoryDelimiter`). One row = one reassembled
    * stream; returns its frames in order. */
  def frame_split(stream: Column, delimiter: String = "\n",
                  rfc6587: Boolean = true): Column =
    ExpressionUtils.column(
      FrameSplit(ExpressionUtils.expression(stream), delimiter, rfc6587))
}
