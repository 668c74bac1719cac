package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>).
  *
  * Two paths:
  *  - [[bruteTopK]]: exact cosine top-k. The QUERY side is broadcast (queries
  *    are few; the corpus is huge), so the corpus never shuffles — one narrow
  *    scan + a per-query top-k aggregation. This is the correctness baseline.
  *  - [[lshNeighbors]]: random-hyperplane LSH. Corpus and queries are both
  *    bucketed by sign-bit signature; search touches only same-bucket (and
  *    optionally hamming-1 neighbor-bucket) candidates. At 10^12 vectors this
  *    is one shuffle on a 4-byte bucket key instead of an O(n·q) scan.
  */
object Ann {

  /** Per-query top-k over a (query_id, neighbor_id, cos) candidate frame via
    * the bounded [[graft.functions.TopKByScore]] heap aggregate — NOT a
    * `row_number` window. The window shape sorts every candidate of a query
    * in ONE task (at 10^12 corpus vectors that is millions of rows per
    * query: a guaranteed straggler/spill); the aggregate holds ≤ k entries
    * per buffer, combines map-side, and its shuffle carries one ≤k-entry
    * buffer per (partition, query) instead of every candidate row. Ordering
    * is identical: (cos desc, neighbor_id asc), rank = position. */
  private def perQueryTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(topk_by_score(col("cos"), col("neighbor_id"), k).as("nb"))
      .select(col("query_id"), posexplode(col("nb")).as(Seq("pos", "s")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("s.neighbor_id").as("neighbor_id"),
        round(col("s.cos"), 4).as("cos"))

  /** exact top-k: broadcast the (small) query set against the corpus. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_v"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_v"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine_sim(col("q_v"), col("c_v")).as("cos"))
    perQueryTopK(scored, k)
  }

  /** IVF-flat coarse quantizer: deterministic seed centroids (the first
    * `nlist` corpus vectors by id) refined by `iters` distributed Lloyd
    * iterations. Each iteration's per-cell mean is computed with a
    * posexplode → (cell, dim) aggregation — one shuffle whose output is only
    * nlist × dim rows — and only the (tiny) centroid matrix is collected to
    * the driver per iteration, which is the normal shape of an IVF index
    * build (FAISS trains its quantizer to convergence the same way): the
    * quantizer is small by definition, the corpus never leaves the cluster.
    * Deterministic for any `iters` (fixed seeds, no sampling); a cell that
    * loses all members keeps its previous centroid. The default single step
    * keeps the bundled benchmarks cheap; production passes iters≈10–25. */
  def ivfCentroids(corpus: DataFrame, nlist: Int,
                   iters: Int = 1): Array[Array[Float]] = {
    // train on rows of the corpus dimension only: a null embedding would
    // null the cell assignment (driver getInt NPE) and a longer vector
    // would index refinement means past the centroid length — irregular
    // rows are dead-lettered from TRAINING (search joins drop them anyway)
    val clean = cleanEmbeddings(corpus)
    var cents: Array[Array[Float]] = clean.orderBy("vec_id").limit(nlist)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    var it = 0
    while (it < iters) {
      val assigned = clean.select(
        element_at(nearest_centroids(col("embedding"), cents, 1), 1).as("cell"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      val means = assigned.groupBy("cell", "dim").agg(avg("v").as("m"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      val refined = cents.map(_.clone())
      means.foreach { case (cell, dim, m) => refined(cell)(dim) = m.toFloat }
      cents = refined
      it += 1
    }
    cents
  }

  /** IVF-flat search: corpus rows live in exactly one cell; queries probe
    * their `nprobe` nearest cells; exact cosine + top-k within the probed
    * union. At 10^12 vectors the scan touches ~nprobe/nlist of the corpus
    * per query batch, and the cell column doubles as the partition key for
    * cell-local storage layout. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, iters: Int = 1): DataFrame = {
    val cents = ivfCentroids(corpus, nlist, iters)
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_v"),
      element_at(nearest_centroids(col("embedding"), cents, 1), 1).as("cell"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_v"),
      explode(nearest_centroids(col("embedding"), cents, nprobe)).as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine_sim(col("q_v"), col("c_v")).as("cos"))
    perQueryTopK(scored, k)
  }

  /** Per-subspace PQ codebooks: deterministic seeds (the first `ksub`
    * corpus vectors by id, split into m subvectors) refined by `iters`
    * distributed Lloyd steps under L2 — same build shape as
    * [[ivfCentroids]]: each assign pass stays on the cluster, the shuffle
    * output is only ksub × dim rows, and only the (tiny) codebook matrix is
    * collected to the driver per iteration. Deterministic for any `iters`;
    * a codeword that loses all members keeps its previous value. */
  /** corpus rows whose embedding is non-null AND carries the corpus
    * dimension (the first non-null row defines it) — the training-input
    * contract shared by [[ivfCentroids]] and [[pqCodebooks]]. */
  private def cleanEmbeddings(corpus: DataFrame): DataFrame = {
    val probe = corpus.filter(col("embedding").isNotNull)
      .orderBy("vec_id").limit(1).select(size(col("embedding"))).collect()
    require(probe.nonEmpty, "corpus has no embeddings to train on")
    corpus.filter(col("embedding").isNotNull &&
      size(col("embedding")) === probe(0).getInt(0))
  }

  def pqCodebooks(corpus: DataFrame, m: Int, ksub: Int,
                  iters: Int = 1): Array[Array[Array[Float]]] = {
    val clean = cleanEmbeddings(corpus)
    val seedVecs = clean.orderBy("vec_id").limit(ksub).select("embedding")
      .collect().map(_.getSeq[Float](0).toArray)
    require(seedVecs.length == ksub,
      s"corpus has only ${seedVecs.length} vectors — fewer than ksub=$ksub codewords")
    val dim = seedVecs(0).length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    var cbs: Array[Array[Array[Float]]] =
      Array.tabulate(m)(j => seedVecs.map(v => v.slice(j * dsub, (j + 1) * dsub)))
    var it = 0
    while (it < iters) {
      val means = clean
        .select(pq_encode(col("embedding"), cbs).as("codes"),
          posexplode(col("embedding")).as(Seq("d", "v")))
        .select(element_at(col("codes"), (col("d") / dsub).cast("int") + 1).as("code"),
          col("d"), col("v"))
        .groupBy("code", "d").agg(avg("v").as("mv"))
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      val refined = cbs.map(_.map(_.clone()))
      means.foreach { case (code, d, mv) =>
        refined(d / dsub)(code)(d % dsub) = mv.toFloat
      }
      cbs = refined
      it += 1
    }
    cbs
  }

  /** IVF-PQ search (the FAISS shape — Jégou et al. 2011): the index stores
    * per vector only (cell, m codes) — at 10^12 × 64-dim float vectors that
    * is ~12 TB instead of ~256 TB, the difference between an index that fits
    * a cluster's disks and one that does not. Candidates in the probed
    * cells are scored by ADC table lookup (m lookups per candidate, no
    * embedding access), the per-query `rerank` best go through an exact
    * cosine re-ranking against the true embeddings (a broadcast-pool gather
    * join — the corpus never shuffles), and the final top-k is the bounded
    * heap aggregate. `nprobe = nlist` with `rerank ≥` the probed candidate
    * count degrades to exact brute force — the oracle configuration. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nlist: Int = 16, nprobe: Int = 4,
                m: Int = 8, ksub: Int = 16, rerank: Int = 32,
                iters: Int = 1): DataFrame = {
    val cents = ivfCentroids(corpus, nlist, iters)
    val cbs = pqCodebooks(corpus, m, ksub, iters)
    val ksubActual = cbs(0).length // the scorer's table stride MUST match cbs
    val n2 = PqKernel.norm2Table(cbs)
    // rows whose embedding dim mismatches the codebooks encode to null —
    // excluded here rather than surfacing as garbage-scored candidates
    val index = corpus.select(col("vec_id").as("neighbor_id"),
      element_at(nearest_centroids(col("embedding"), cents, 1), 1).as("cell"),
      pq_encode(col("embedding"), cbs).as("codes"))
      .filter(col("codes").isNotNull)
    val q = queries.select(col("vec_id").as("query_id"),
      pq_dot_table(col("embedding"), cbs).as("tbl"),
      explode(nearest_centroids(col("embedding"), cents, nprobe)).as("cell"))
      .filter(col("tbl").isNotNull)
    val approx = index.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        pq_adc_score(col("codes"), col("tbl"), n2, ksubActual).as("cos"))
    val pool = approx.groupBy("query_id")
      .agg(topk_by_score(col("cos"), col("neighbor_id"), rerank).as("nb"))
      .select(col("query_id"), explode(col("nb")).as("s"))
      .select(col("query_id"), col("s.neighbor_id").as("neighbor_id"))
    val qv = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_v"))
    val scored = corpus
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_v"))
      .join(broadcast(pool), Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine_sim(col("q_v"), col("c_v")).as("cos"))
    perQueryTopK(scored, k)
  }

  /** Multi-table LSH neighbor search (the classic L-tables × b-planes
    * construction): each vector lands in one bucket per table; a candidate is
    * any corpus vector sharing a (table, bucket) cell with the query. Exact
    * cosine + per-query top-k run only over candidates.
    *
    * Recall for a neighbor at angle θ is 1-(1-p^b)^L with p = 1-θ/π — the
    * defaults (b=3, L=12) give ≥0.95 even for weakly-similar neighbors
    * (cos ≈ 0.3) while touching ~L/2^b of the corpus per query. At 10^12
    * vectors the index is an L-fold explode shuffled on a tiny
    * (table, bucket) key; queries stay broadcast.
    */
  def lshNeighbors(corpus: DataFrame, queries: DataFrame, k: Int,
                   planes: Int = 3, tables: Int = 12,
                   probeHamming: Int = 0): DataFrame = {
    val c = Lsh.hyperplaneBanded(corpus, "neighbor_id", "c_v", planes, tables)
    // query side: banding + multiprobe via the shared Lsh helpers (one
    // definition of probe enumeration across search and near-dup paths)
    val q = Lsh.multiprobe(
      Lsh.hyperplaneBanded(queries, "query_id", "q_v", planes, tables),
      Seq("query_id", "q_v"), planes, probeHamming)
    val scored = c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      // score BEFORE deduplicating across tables: the dedup shuffle then
      // carries (ids, cos) — 20 bytes — instead of two full embedding
      // vectors per candidate collision (up to L copies each)
      .select(col("query_id"), col("neighbor_id"),
        cosine_sim(col("q_v"), col("c_v")).as("cos"))
      .dropDuplicates("query_id", "neighbor_id")
    perQueryTopK(scored, k)
  }
}
