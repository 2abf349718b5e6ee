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
  * emitting a 0/1-element ARRAY of quad structs that the caller
  * explodes — the whole ingest pipeline (text scan → parse → explode →
  * project) stays inside generated code with no RDD hop and no
  * Row-codec round-trip. The array-not-nullable-struct shape matters:
  * a nullable scalar + `isNotNull` filter gets the parse expression
  * DUPLICATED by filter pushdown (one copy in Filter, one in Project —
  * every line parsed twice); explode evaluates it exactly once.
  *
  * Empty array = nothing to emit: blank lines, comment lines, and — in
  * permissive mode — lines that fail to parse (the dirty-corpus knob;
  * strict mode throws the parser's positioned error and fails the
  * load, which stays the default).
  */
object NtParse {

  private val NO_QUADS =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])

  /** Static entry point for generated code. */
  def parseLine(line: UTF8String,
                permissive: Boolean): org.apache.spark.sql.catalyst.util.ArrayData =
    try TurtleParser.parseNTriplesLine(line.toString) match {
      case Some(q) => new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](TermSchema.quadToInternal(q)))
      case None => NO_QUADS
    } catch {
      case e: IllegalArgumentException => if (permissive) NO_QUADS else throw e
    }

  case class ParseNTripleExpr(child: Expression, permissive: Boolean)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects string, got $other")
      }
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(TermSchema.quadType,
        containsNull = false)
    override def prettyName: String = "parse_ntriple"

    override def nullSafeEval(s: Any): Any =
      parseLine(s.asInstanceOf[UTF8String], permissive)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => s"""
        |${ev.value} = graft.functions.NtParse.parseLine($a, $permissive);
        """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def parseNTripleCol(line: Column, permissive: Boolean): Column =
    GraftColumnBridge.column(
      ParseNTripleExpr(GraftColumnBridge.expression(line), permissive))

  /** Static entry point for generated code: whole-file parse (any
    * format QuadsIO.parseFile dispatches) to an array of quad structs.
    * In permissive mode an unparseable FILE yields zero quads (the
    * whole file is dropped — heavier than a dropped line, which is
    * why strict stays the default everywhere). */
  def parseFileQuads(path: UTF8String, content: Array[Byte],
                     permissive: Boolean): org.apache.spark.sql.catalyst.util.ArrayData =
    try {
      val out = graft.io.QuadsIO.parseFile(path.toString, content)
        .map(q => TermSchema.quadToInternal(q): Any).toArray
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } catch {
      case e: IllegalArgumentException => if (permissive) NO_QUADS else throw e
    }

  /** (path, content) → array<quad struct>: the executor half of
    * [[graft.io.QuadsIO.readFiles]], kept as a native expression so
    * the explode + projection above it stay in whole-stage codegen. */
  case class ParseRdfFileExpr(left: Expression, right: Expression,
                              permissive: Boolean)
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
      parseFileQuads(p.asInstanceOf[UTF8String], c.asInstanceOf[Array[Byte]],
        permissive)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (p, c) => s"""
        |${ev.value} = graft.functions.NtParse.parseFileQuads($p, $c, $permissive);
        """.stripMargin)

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def parseRdfFileCol(path: Column, content: Column,
                      permissive: Boolean = false): Column =
    GraftColumnBridge.column(ParseRdfFileExpr(
      GraftColumnBridge.expression(path), GraftColumnBridge.expression(content),
      permissive))
}
