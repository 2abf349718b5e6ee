package graft.functions

import graft.rdf.{TermSchema, TurtleParser}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native N-Triples/N-Quads line parsing: one generated call per line,
  * emitting the quad struct directly as an [[InternalRow]] — the whole
  * ingest pipeline (text scan → parse → filter → project) stays inside
  * whole-stage codegen with no RDD hop and no Row-codec round-trip.
  *
  * NULL result = nothing to emit: blank lines, comment lines, and — in
  * permissive mode — lines that fail to parse (the dirty-corpus knob;
  * strict mode throws the parser's positioned error and fails the
  * load, which stays the default).
  */
object NtParse {

  /** Static entry point for generated code. */
  def parseLine(line: UTF8String, permissive: Boolean): InternalRow =
    try TurtleParser.parseNTriplesLine(line.toString) match {
      case Some(q) => TermSchema.quadToInternal(q)
      case None => null
    } catch {
      case e: IllegalArgumentException => if (permissive) null else throw e
    }

  case class ParseNTripleExpr(child: Expression, permissive: Boolean)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects string, got $other")
      }
    override def dataType: DataType = TermSchema.quadType
    override def nullable: Boolean = true
    override def prettyName: String = "parse_ntriple"

    override def nullSafeEval(s: Any): Any =
      parseLine(s.asInstanceOf[UTF8String], permissive)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val tmp = ctx.freshName("quad")
        s"""
        |org.apache.spark.sql.catalyst.InternalRow $tmp =
        |  graft.functions.NtParse.parseLine($a, $permissive);
        |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
        """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def parseNTripleCol(line: Column, permissive: Boolean): Column =
    GraftColumnBridge.column(
      ParseNTripleExpr(GraftColumnBridge.expression(line), permissive))

  /** Static entry point for generated code: whole-file parse (any
    * format QuadsIO.parseFile dispatches) to an array of quad structs. */
  def parseFileQuads(path: UTF8String,
                     content: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = graft.io.QuadsIO.parseFile(path.toString, content)
      .map(q => TermSchema.quadToInternal(q): Any).toArray
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** (path, content) → array<quad struct>: the executor half of
    * [[graft.io.QuadsIO.readFiles]], kept as a native expression so
    * the explode + projection above it stay in whole-stage codegen. */
  case class ParseRdfFileExpr(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, org.apache.spark.sql.types.BinaryType) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (string path, binary content), got $other")
      }
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(TermSchema.quadType,
        containsNull = false)
    override def prettyName: String = "parse_rdf_file"

    override def nullSafeEval(p: Any, c: Any): Any =
      parseFileQuads(p.asInstanceOf[UTF8String], c.asInstanceOf[Array[Byte]])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (p, c) => s"""
        |${ev.value} = graft.functions.NtParse.parseFileQuads($p, $c);
        """.stripMargin)

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def parseRdfFileCol(path: Column, content: Column): Column =
    GraftColumnBridge.column(ParseRdfFileExpr(
      GraftColumnBridge.expression(path), GraftColumnBridge.expression(content)))
}
