package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}

import graft.ivm.{Ivm, SqlFrontend}

/** Session-extension integration: makes the IVM DDL a first-class SQL
  * statement —
  *
  *   spark.sql("CREATE IMMV name AS SELECT ...")   registers the view
  *   Ivm.upsert(spark, name)                        ≙ PRAGMA ivm_upsert
  *   spark.sql("SELECT * FROM delta_name")          reads the result
  *
  * The reference does the same wiring as a DuckDB ParserExtension
  * (ivm_parser.cpp:14-52 recognizes the string, ivm_extension.cpp:121
  * registers it) but its plan function returns an empty result; here the
  * command actually registers the view.
  *
  * Enable with:
  *   SparkSession.builder().withExtensions(new GraftSparkExtension)  or
  *   --conf spark.sql.extensions=graft.plans.GraftSparkExtension
  */
class GraftSparkExtension extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((_, delegate) => new ImmvParser(delegate))
    // The custom function surface rides along with the extension, so SQL
    // users get the codegen'd dot product too: graft_vec_dot(a, b).
    ext.injectFunction(graft.functions.VecDot.functionDescription)
    graft.functions.Kll.functionDescriptions.foreach(ext.injectFunction)
    graft.functions.Freq.functionDescriptions.foreach(ext.injectFunction)
  }
}

/** Delegating parser: intercepts `CREATE IMMV <name> AS <select>`, hands
  * every other statement to Spark's parser (the same trigger-substring
  * design as the reference's IVMParseFunction, ivm_parser.cpp:24-26). */
class ImmvParser(delegate: ParserInterface) extends ParserInterface {
  private val CreateImmv = """(?is)\s*create\s+immv\s+(\w+)\s+as\s+(.*)""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case CreateImmv(name, select) => CreateImmvCommand(name, select.trim)
    case _                        => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] = delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
}

/** `CREATE IMMV` as a runnable command: registers the view definition in
  * the IVM catalog at execution time. */
case class CreateImmvCommand(name: String, select: String) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    Ivm.createView(name, SqlFrontend.parseSelect(session, select))
    Seq.empty
  }
}
