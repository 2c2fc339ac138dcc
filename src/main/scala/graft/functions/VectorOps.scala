package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector arithmetic over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs in
  * the hot path (SURVEY.md §2.10: prefer Column expressions).
  *
  * Determinism contract: embeddings are float32; any float reduction is
  * order- and width-sensitive across engines. We therefore quantize each
  * component to an exact integer (`round(x*10000)` — float32 has a 24-bit
  * mantissa, so x*10000 is exact in double and the rounding is
  * reproducible), and all dot products / norms are exact BIGINT sums that
  * match DuckDB bit-for-bit in any evaluation order. Cosine thresholds are
  * evaluated as integer cross-multiplications (no sqrt, no division):
  * cos(a,b) >= t  ⟺  dot>0 ∧ dot² * (1/t²) >= |a|²|b|².
  */
object VectorOps {

  /** float32 embedding → exact integer lattice (unit = 1e-4). */
  def quantize(c: Column): Column =
    transform(c, x => round(x.cast("double") * 10000, 0).cast("long"))

  /** Exact integer dot product of two quantized vectors — a native
    * codegen'd Catalyst expression ([[LongDotProduct]]); the interpreted
    * `zip_with`+`aggregate` form cost ~10× on the pairwise joins.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(LongDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Exact integer squared norm. */
  def norm2(a: Column): Column = dot(a, a)

  /** Signed cos² ranking key: sign(dot) * dot² / (|a|²|b|²) ∈ [-1, 1].
    * Monotone in cosine, computed with one double division over exact
    * integers — bit-identical across engines given the same expression
    * shape. Break ranking ties on an id column.
    */
  def cos2Key(dotC: Column, na: Column, nb: Column): Column =
    (dotC * dotC).cast("double") / (na * nb).cast("double") *
      when(dotC < 0, -1.0).otherwise(1.0)
}
