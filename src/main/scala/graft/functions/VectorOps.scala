package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(DoubleType)` columns — no UDFs, so
  * whole-stage codegen and Catalyst rewrites stay intact. Sums run in array
  * order, which keeps the floating-point result bit-identical to a
  * sequential oracle evaluation.
  */
object VectorOps {
  /** Σ aᵢ·bᵢ via the native codegen'd `DotProduct` expression, wrapped
    * directly into a Column — works on any session, registered or not
    * (`GraftFunctions.register` additionally exposes it to SQL as
    * `graft_dot`). Bit-equal to `dotHof` — same multiply-add order.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.classic.GraftColumnBridge
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** HOF formulation of Σ aᵢ·bᵢ — registration-free fallback and the
    * reference implementation DotProductSpec pins the native one against.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Σ (aᵢ−bᵢ)² over `array<bigint>` via the native codegen'd `L2SqDist`
    * expression — the integer distance kernel of the quantized-vector
    * operators (q146). SQL-callable as `graft_l2sq` after registration.
    */
  def l2sq(a: Column, b: Column): Column = {
    import org.apache.spark.sql.classic.GraftColumnBridge
    GraftColumnBridge.column(
      L2SqDist(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** HOF formulation of Σ (aᵢ−bᵢ)² — registration-free fallback and the
    * reference implementation L2SqDistSpec pins the native one against.
    */
  def l2sqHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  /** Cosine similarity; callers cast inputs to array<double> first. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
}
