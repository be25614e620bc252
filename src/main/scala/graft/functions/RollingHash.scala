package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim.Shim

/** Polynomial rolling hash (base-257, 64-bit wraparound) over a string's
  * UTF-8 bytes — the document-fingerprinting primitive (content-defined
  * chunking / incremental fingerprints at 100 TB want a rolling hash, not a
  * cryptographic one).
  *
  * Implemented as a native Catalyst `Expression` with `doGenCode`, so it
  * participates in whole-stage codegen instead of breaking the pipeline the
  * way a Scala UDF would (UDFs force object boxing and close codegen spans).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 257L + (bytes(i) & 0xff); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 257L + ($bytes[$i] & 0xff);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Column-API entry point: `rolling_hash($"text")`. */
  def rolling_hash(c: Column): Column =
    Shim.column(RollingHash(Shim.expression(c)))

  /** Reference implementation for tests. */
  def reference(s: String): Long = {
    val bytes = s.getBytes("UTF-8")
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 257L + (bytes(i) & 0xff); i += 1 }
    h
  }
}
