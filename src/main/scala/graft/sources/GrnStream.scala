package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Groonga command-stream interop at the LIBRARY level: export any
  * DataFrame as the reference's `dump` wire format (`table_create` /
  * `column_create` / `load` — reference emitter lib/proc.c:1814), and parse
  * such a stream — including output of the reference's own `dump` command —
  * back into DataFrames (reference loader lib/proc.c:134).
  *
  * Scope: data tables (hash-key or no-key), scalar and vector columns of
  * the builtin value types; index/tokenizer DDL lines are accepted and
  * skipped on parse (indexes are rebuilt by [[graft.index.IndexBuilder]] —
  * a dump never carries posting data anyway).
  *
  * Scale note: a command stream is an inherently serial text artifact (the
  * reference writes one file too) — rows stream through
  * `toLocalIterator` so the driver never holds the table, but the sink is
  * sequential by design; parquet stays the bulk format.
  */
object GrnStream {

  private val mapper = new ObjectMapper()

  /** Spark → Groonga builtin type name. */
  def grnType(dt: DataType): String = dt match {
    case StringType => "ShortText"
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType | DoubleType => "Float"
    case BooleanType => "Bool"
    case other => throw new IllegalArgumentException(s"unsupported Spark type $other")
  }

  /** Groonga builtin → Spark type (unsigned widths widen to the next
    * signed Spark type; Text variants are all StringType).
    */
  def sparkType(g: String): DataType = g match {
    case "ShortText" | "Text" | "LongText" => StringType
    case "Int8" => ByteType
    case "Int16" | "UInt8" => ShortType
    case "Int32" | "UInt16" => IntegerType
    case "Int64" | "UInt32" | "UInt64" | "Time" => LongType
    case "Float" | "Float32" => DoubleType
    case "Bool" => BooleanType
    case other => throw new IllegalArgumentException(s"unsupported Groonga type $other")
  }

  private def jstr(s: String): String = mapper.writeValueAsString(s)

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => jstr(s)
    case b: Boolean => b.toString
    case f: Float => jsonValue(f.toDouble)
    // NaN/Infinity have no JSON representation — serialize as null rather
    // than emitting an unparseable literal
    case d: Double if d.isNaN || d.isInfinite => "null"
    case d: Double => if (d == math.floor(d)) {
      // Groonga dumps integral floats as "1.0"
      val l = d.toLong
      if (l.toDouble == d) s"$l.0" else d.toString
    } else d.toString
    case n: Number => n.toString
    case seq: scala.collection.Seq[_] => seq.map(jsonValue).mkString("[", ",", "]")
    case other => jstr(other.toString)
  }

  /** Emit the command stream for one DataFrame into `out`: `table_create`
    * (+ one `column_create` per non-key column) followed by a single `load`
    * in header-array row format — the reference's `dump` layout for data
    * tables (commands separated by blank lines, rows joined with ",\n").
    * Rows stream via `toLocalIterator` straight into the Writer, so the
    * driver holds one row at a time and the dump size is bounded only by
    * the sink (write to a file/pipe for big tables). Row order is the
    * DataFrame's — pre-sort for a canonical dump.
    */
  def dump(name: String, df: DataFrame, out: java.io.Writer,
      keyCol: Option[String] = None): Unit = {
    val schema = df.schema
    keyCol.foreach(k => require(schema.fieldNames.contains(k), s"no key column $k"))
    val valueFields = schema.fields.filterNot(f => keyCol.contains(f.name))
    val head = keyCol match {
      case Some(k) => s"table_create $name TABLE_HASH_KEY ${grnType(schema(k).dataType)}"
      case None => s"table_create $name TABLE_NO_KEY"
    }
    val colLines = valueFields.map { f =>
      f.dataType match {
        case ArrayType(et, _) => s"column_create $name ${f.name} COLUMN_VECTOR ${grnType(et)}"
        case dt => s"column_create $name ${f.name} COLUMN_SCALAR ${grnType(dt)}"
      }
    }
    val header = (keyCol.map(_ => "_key").toSeq ++ valueFields.map(_.name))
      .map(jstr).mkString("[", ",", "]")
    val ordered = keyCol.map(k => df.select(k, valueFields.map(_.name): _*)).getOrElse(df)
    out.write(head); out.write("\n\n")
    colLines.foreach { c => out.write(c); out.write("\n\n") }
    out.write(s"load --table $name\n[\n"); out.write(header)
    val rows = ordered.toLocalIterator()
    while (rows.hasNext) {
      val r = rows.next()
      out.write(",\n")
      out.write((0 until r.length).map(i => jsonValue(r.get(i))).mkString("[", ",", "]"))
    }
    out.write("\n]\n")
  }

  /** [[dump]] into one in-memory String — convenient for small tables and
    * tests; the whole dump materializes on the driver (JVM String cap
    * ~2G chars), so use the Writer form for anything big.
    */
  def dumpText(name: String, df: DataFrame, keyCol: Option[String] = None): String = {
    val sw = new java.io.StringWriter()
    dump(name, df, sw, keyCol)
    sw.toString
  }

  private case class TableDecl(
      name: String,
      keyType: Option[String],
      cols: mutable.ArrayBuffer[(String, Boolean, String)] = mutable.ArrayBuffer(), // (name, isVector, type)
      rows: mutable.ArrayBuffer[Map[String, JsonNode]] = mutable.ArrayBuffer())

  /** Parse a command stream (e.g. reference `dump` output) into one
    * DataFrame per data table. `table_create`, `column_create` (index
    * columns — COLUMN_INDEX flags — are skipped), and `load` in both
    * header-array and object row forms are understood; unknown command
    * lines and blank lines are skipped. Column types that name another
    * declared table resolve to that table's key type (reference columns
    * hold keys).
    */
  def parseCommands(spark: SparkSession, text: String): Map[String, DataFrame] = {
    val lines = text.linesIterator.toArray
    val decls = mutable.LinkedHashMap[String, TableDecl]()
    var i = 0
    while (i < lines.length) {
      val line = lines(i).trim
      val toks = line.split("\\s+").toSeq
      toks.headOption match {
        case Some("table_create") if toks.size >= 3 =>
          val name = toks(1)
          val keyType =
            if (toks(2).contains("NO_KEY")) None
            else toks.lift(3).filterNot(_.startsWith("--"))
          decls(name) = TableDecl(name, keyType)
        case Some("column_create") if toks.size >= 5 =>
          val (table, cname, flags, ctype) = (toks(1), toks(2), toks(3), toks(4))
          if (!flags.contains("COLUMN_INDEX"))
            decls.get(table).foreach(_.cols +=
              ((cname, flags.contains("COLUMN_VECTOR"), ctype)))
        case Some("load") =>
          val table = toks.sliding(2).collectFirst { case Seq("--table", t) => t }
            .getOrElse(throw new IllegalArgumentException(s"load without --table: $line"))
          // gather the JSON body: following lines until brackets balance
          val body = new StringBuilder
          var depth = 0; var started = false; var inStr = false; var esc = false
          while (i + 1 < lines.length && (!started || depth > 0)) {
            i += 1
            val l = lines(i)
            body.append(l).append('\n')
            l.foreach { ch =>
              if (esc) esc = false
              else if (inStr) { if (ch == '\\') esc = true else if (ch == '"') inStr = false }
              else ch match {
                case '"' => inStr = true
                case '[' | '{' => depth += 1; started = true
                case ']' | '}' => depth -= 1
                case _ => ()
              }
            }
          }
          val arr = mapper.readTree(body.toString)
          require(arr != null && arr.isArray, s"load body is not a JSON array for $table")
          val td = decls.getOrElseUpdate(table, TableDecl(table, Some("ShortText")))
          if (arr.size > 0 && arr.get(0).isArray) {
            val header = (0 until arr.get(0).size).map(j => arr.get(0).get(j).asText)
            (1 until arr.size).foreach { r =>
              val row = arr.get(r)
              td.rows += header.zipWithIndex.map { case (h, j) => h -> row.get(j) }.toMap
            }
          } else {
            (0 until arr.size).foreach { r =>
              val obj = arr.get(r)
              val m = mutable.Map[String, JsonNode]()
              obj.fieldNames().forEachRemaining(f => m(f) = obj.get(f))
              td.rows += m.toMap
            }
          }
        case _ => () // blank / comment / unsupported command: skip
      }
      i += 1
    }

    def resolve(t: String): DataType =
      decls.get(t) match {
        case Some(ref) => sparkType(ref.keyType.getOrElse("ShortText"))
        case None => sparkType(t)
      }

    decls.values.map { td =>
      val fields = td.keyType.map(k => StructField("_key", sparkType(k))).toSeq ++
        td.cols.map { case (n, isVec, t) =>
          val base = resolve(t)
          StructField(n, if (isVec) ArrayType(base) else base)
        }
      val schema = StructType(fields)
      def conv(node: JsonNode, dt: DataType): Any =
        if (node == null || node.isNull) null
        else dt match {
          case StringType => node.asText
          case ByteType => node.asInt.toByte
          case ShortType => node.asInt.toShort
          case IntegerType => node.asInt
          case LongType => node.asLong
          case DoubleType => node.asDouble
          case BooleanType => node.asBoolean
          case ArrayType(et, _) =>
            (0 until node.size).map(j => conv(node.get(j), et))
          case other => throw new IllegalArgumentException(s"unsupported $other")
        }
      val rows = td.rows.map { m =>
        Row.fromSeq(fields.map(f => m.get(f.name).map(conv(_, f.dataType)).orNull))
      }
      import scala.jdk.CollectionConverters._
      td.name -> spark.createDataFrame(rows.asJava, schema)
    }.toMap
  }
}
