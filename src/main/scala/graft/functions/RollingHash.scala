package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash over a string's UTF-8 bytes —
  * document fingerprinting primitive (training-data mandate). A native
  * Catalyst expression with codegen (not a Scala UDF), so it stays
  * inside whole-stage codegen on the hot path.
  *
  * h = Σ h·base + byte_i  (mod 2^64), base = 1000003 (a prime used by
  * several public string hashers).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * 1000003L + (bytes(i) & 0xffL)
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      s"""byte[] $bytes = $c.getBytes();
         |long h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  h = h * 1000003L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = h;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}
