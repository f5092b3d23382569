package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Native-function vector math over `array<float>` embedding columns
  * (the reference declares `embedding FLOAT[]` at
  * ethical_crawler.py:842 and imports cosine_similarity at :33 without
  * ever implementing it — this is the L1 latent surface, SURVEY §2.11).
  *
  * Everything is built from `zip_with`/`aggregate` Column expressions —
  * no UDFs, no collect — so the same expressions run distributed and
  * stay inside Catalyst. All arithmetic is promoted to double FIRST
  * (float→double is exact) and summed in array order, which keeps
  * results bit-comparable with the DuckDB oracle's sequential sums.
  */
object VectorFunctions {

  /** Exact float→double promotion of an `array<float>` column. A
    * Cast, NOT `transform(_, cast)`: higher-order functions are
    * CodegenFallback and evict the whole projection from
    * whole-stage codegen; Cast stays inside it. Element-wise result
    * is identical.
    */
  def toDoubleArray(a: Column): Column =
    a.cast("array<double>")

  /** Sequential-order dot product of two double-array columns, as the
    * codegen [[DotProduct]] expression (registered by
    * [[graft.GraftExtensions]]; every session built via
    * `graft.Sessions` has it). Bit-identical to [[dotHof]].
    */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** Higher-order-function formulation of the same dot product
    * (`zip_with` + `aggregate`): pure built-ins, runs on ANY session,
    * but CodegenFallback — kept as the reference implementation the
    * codegen path is differential-tested against.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double-array columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine given precomputed norms (saves two passes in pairwise
    * workloads where norms are computed once per vector, not per pair).
    */
  def cosinePrenormed(a: Column, b: Column,
      normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
