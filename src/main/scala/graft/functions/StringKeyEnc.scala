package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd string→surrogate kernels for the versioned store's file
  * stats ([[graft.tables.KeyEnc]] semantics, bit-for-bit): the ordered
  * 8-byte big-endian prefix (range surrogate) and the FNV-1a 64 hash
  * (bloom key). The stats scan runs once per WRITTEN FILE'S ROWS on
  * every string-keyed publish/merge rewrite — as plain UDFs the boxing
  * (String allocation + java.lang.Long per row) dominated large
  * rewrites; these stay inside whole-stage codegen and read the
  * UTF8String bytes directly.
  *
  * Byte-level parity with `KeyEnc.encodeString`/`hashString` is pinned
  * by StringKeyEncSpec (property test over random unicode strings):
  * `UTF8String.getBytes` IS the UTF-8 encoding both sides hash.
  */
object StringKeyEnc {
  /** Monotone 8-byte big-endian prefix, order-shifted to signed Long. */
  def prefix(s: UTF8String): Long = {
    val b = s.getBytes
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (if (i < b.length) b(i) & 0xffL else 0L); i += 1 }
    v ^ java.lang.Long.MIN_VALUE
  }

  /** Full-string FNV-1a 64 (the bloom key). */
  def fnv(s: UTF8String): Long = {
    var h = 0xcbf29ce484222325L
    val b = s.getBytes
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  def prefixCol(c: Column): Column = {
    import org.apache.spark.sql.classic.GraftColumnBridge
    GraftColumnBridge.column(StringPrefixEnc(GraftColumnBridge.expression(c)))
  }
  def fnvCol(c: Column): Column = {
    import org.apache.spark.sql.classic.GraftColumnBridge
    GraftColumnBridge.column(StringFnvHash(GraftColumnBridge.expression(c)))
  }
}

private[graft] sealed trait StringKeyEncExpr extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $other")
  }
}

case class StringPrefixEnc(child: Expression) extends StringKeyEncExpr {
  override def prettyName: String = "graft_str_prefix"
  override protected def nullSafeEval(s: Any): Any =
    StringKeyEnc.prefix(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StringKeyEnc.prefix($c)")
  override protected def withNewChildInternal(c: Expression): StringPrefixEnc =
    copy(child = c)
}

case class StringFnvHash(child: Expression) extends StringKeyEncExpr {
  override def prettyName: String = "graft_str_fnv"
  override protected def nullSafeEval(s: Any): Any =
    StringKeyEnc.fnv(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StringKeyEnc.fnv($c)")
  override protected def withNewChildInternal(c: Expression): StringFnvHash =
    copy(child = c)
}
