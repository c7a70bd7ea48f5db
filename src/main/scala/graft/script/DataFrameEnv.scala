package graft.script

import graft.script.ScriptExpr._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Binds the script-syntax expression engine to a plain DataFrame schema so
  * library users can pass Groonga `--filter` strings over any table
  * (reference grammar lib/grn_ecmascript.lemon:40-303, lexer
  * lib/expr.c:7015-7450). Match-family operators (`@`, `@^`, `@$`, `@~`)
  * fall back to the sequential-scan semantics; callers with an inverted
  * index should route them through [[graft.command.Select]] instead.
  *
  * Nested struct fields resolve through dotted paths (`a.b.c`), the
  * analogue of the reference's accessor chains (lib/db.c:5306-5600) for
  * schema-embedded (rather than reference-joined) nesting.
  */
final class DataFrameEnv(schema: StructType) extends Env {

  private def gtypeOf(dt: DataType): GType = dt match {
    case ByteType => GInt(8, signed = true)
    case ShortType => GInt(16, signed = true)
    case IntegerType => GInt(32, signed = true)
    case LongType => GInt(64, signed = true)
    case FloatType | DoubleType | _: DecimalType => GFloat
    case BooleanType => GBool
    case StringType => GText
    case TimestampType | DateType => GTime
    case ArrayType(e, _) => GVec(gtypeOf(e))
    case _ => GAny
  }

  override def resolve(path: Seq[String]): Option[TVal] = {
    def walk(dt: DataType, rest: Seq[String]): Option[DataType] = rest match {
      case Seq() => Some(dt)
      case head +: tail => dt match {
        case st: StructType =>
          st.fields.find(_.name == head).flatMap(f => walk(f.dataType, tail))
        case ArrayType(st: StructType, _) =>
          st.fields.find(_.name == head)
            .flatMap(f => walk(f.dataType, tail)).map(ArrayType(_))
        case _ => None
      }
    }
    walk(schema, path).map { dt =>
      TVal(col(path.mkString(".")), gtypeOf(dt), path = Some(path))
    }
  }
}

object DataFrameEnv {
  /** Apply a Groonga script-syntax filter string to `df`. */
  def filter(df: DataFrame, script: String): DataFrame = {
    val lowered = ScriptExpr.lower(script, new DataFrameEnv(df.schema))
    val v = lowered.value
    df.filter(v.bool.getOrElse(v.col).cast("boolean"))
  }
}
