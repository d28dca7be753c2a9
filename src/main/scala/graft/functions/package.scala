package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge

/** Column-level entry points for graft's custom Catalyst expressions. */
package object functions {

  /** DRI path quoting (see [[graft.functions.PercentEncode]]). */
  def percent_encode(c: Column): Column =
    graftbridge.column(PercentEncodeExpr(graftbridge.expression(c)))

  /** Unicode NFC normalization (java.text.Normalizer; UAX #15). */
  def nfc_normalize(c: Column): Column =
    graftbridge.column(NfcNormalizeExpr(graftbridge.expression(c)))

  /** Python `str.replace(find, repl, 1)` — first literal occurrence only. */
  def replace_first(str: Column, find: Column, repl: Column): Column =
    graftbridge.column(ReplaceFirstExpr(
      graftbridge.expression(str),
      graftbridge.expression(find),
      graftbridge.expression(repl)))

  /** Bloom membership probe over a string-key array (see
    * [[graft.functions.BloomProbeExpr]]): interleaved md5 + bit test,
    * declarative-parity with `BloomDecon.probeDeclarative`.
    */
  def bloom_probe(keys: Column, bits: IndexedSeq[Long], m: Int, k: Int): Column =
    graftbridge.column(BloomProbeExpr(graftbridge.expression(keys), bits, m, k))

  /** Sequential-deterministic dot product of two float/double arrays. */
  def dot_product(a: Column, b: Column): Column =
    graftbridge.column(DotProductExpr(
      graftbridge.expression(a), graftbridge.expression(b)))

  /** int array (unsigned-byte values) → m-byte binary (PQ code layout). */
  def pack_bytes(a: Column): Column =
    graftbridge.column(PackBytesExpr(graftbridge.expression(a)))

  /** m-byte binary → int array of unsigned byte values. */
  def unpack_bytes(b: Column): Column =
    graftbridge.column(UnpackBytesExpr(graftbridge.expression(b)))

  /** k-seed MinHash signature of a shingle array (one pass, reused md5). */
  def minhash_sig(shingles: Column, k: Int): Column =
    graftbridge.column(MinHashSigExpr(graftbridge.expression(shingles), k))

  /** Integer MinHash signature: one md5 per shingle + k Carter-Wegman
    * mixes (12× less hash CPU than the k-md5 family at k=12).
    */
  def minhash_int_sig(shingles: Column, k: Int): Column =
    graftbridge.column(MinHashIntSigExpr(graftbridge.expression(shingles), k))

  /** One-permutation-hashing MinHash signature with rotation
    * densification: ONE cheap poly-Lehmer hash per shingle, no md5 —
    * the 100 TB signature family (same S-curve, ~an order less CPU).
    */
  def oph_minhash_sig(shingles: Column, k: Int): Column =
    graftbridge.column(OphMinHashSigExpr(graftbridge.expression(shingles), k))

  /** |A ∩ B| of two ascending-sorted distinct long arrays: linear merge,
    * zero allocation — the candidate-grain rescore verifier (parity:
    * `size(array_intersect(a, b))`).
    */
  def sorted_intersect_count(a: Column, b: Column): Column =
    graftbridge.column(SortedIntersectCountExpr(
      graftbridge.expression(a), graftbridge.expression(b)))

  /** Per-table LSH bucket signatures (precomputed hyperplane sign matrix). */
  def lsh_sig(vec: Column, tables: Int, planes: Int, dims: Int): Column =
    graftbridge.column(LshSigExpr(graftbridge.expression(vec), tables, planes, dims))

  /** Bounded-heap top-k per group: array<struct<nid,sim,rank>> by
    * (score desc, id asc) with map-side partial aggregation — ≤k rows per
    * group per partition reach the shuffle (vs a window's full sort).
    */
  def topk_by(score: Column, id: Column, k: Int): Column =
    graftbridge.column(TopKByDescExpr(
      graftbridge.expression(score), graftbridge.expression(id), k)
      .toAggregateExpression())

  /** Misra-Gries frequent-items summary (<= k counters per partition,
    * map-side partial agg): array<struct<item,est>> CANDIDATES — every
    * item with true count > n/(k+1) is guaranteed present; estimates are
    * order-dependent, so exact-recount before trusting them.
    */
  def misra_gries(item: Column, k: Int): Column =
    graftbridge.column(MisraGriesAgg(graftbridge.expression(item), k)
      .toAggregateExpression())

  /** Content-defined chunk spans (md5-window boundary rule; see
    * [[graft.functions.CdcChunksExpr]]).
    */
  def cdc_chunks(text: Column, w: Int): Column =
    graftbridge.column(CdcChunksExpr(graftbridge.expression(text), w))

  /** All dyadic-window rolling hashes of a string in one pass (the
    * declarative explode→substr→xxhash64 form allocates and re-hashes
    * every window from scratch).
    */
  def dyadic_window_hashes(text: Column, levels: Seq[Int]): Column =
    graftbridge.column(DyadicWindowHashesExpr(graftbridge.expression(text), levels))

  /** [[dyadic_window_hashes]] with winnowing sampling on levels ≥
    * `fromLevel` (~2/(w+1) of stride-1 volume, SQL-replayable selection;
    * see [[graft.functions.DyadicWindowHashesExpr]]).
    */
  def dyadic_window_hashes_winnow(text: Column, levels: Seq[Int],
                                  fromLevel: Int, w: Int): Column =
    graftbridge.column(DyadicWindowHashesExpr(
      graftbridge.expression(text), levels, fromLevel, w))

  /** Viterbi unigram segmentation value (cost·16 + pieces; one HashMap
    * probe per span — the literal-map declarative DP scans all entries).
    */
  def unigram_seg(word: Column, vocab: Map[String, Long],
                  maxSub: Int, maxWord: Int): Column =
    graftbridge.column(UnigramSegExpr(
      graftbridge.expression(word), vocab, maxSub, maxWord))
}
