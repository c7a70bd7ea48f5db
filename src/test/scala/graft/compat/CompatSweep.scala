package graft.compat

import graft.SparkTestBase
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Sweep EVERY reference select fixture whose command set the runner
  * supports, record pass / mismatch / unsupported per fixture, and write
  * `target/compat_sweep.tsv`. Used to freeze the passing list asserted by
  * CompatSpec and to report coverage honestly in COVERAGE.md.
  *
  * Run: sbt "Test/runMain graft.compat.CompatSweep [maxFixtures]"
  */
object CompatSweep {

  def main(args: Array[String]): Unit = {
    val (prefix, max) = args.toList match {
      case Nil => ("", Int.MaxValue)
      case n :: rest if n.forall(_.isDigit) => ("", n.toInt)
      case p :: n :: _ if n.forall(_.isDigit) => (p, n.toInt)
      case p :: _ => (p, Int.MaxValue)
    }
    val suite = Paths.get("/root/reference/test/command/suite")
    val spark = SparkTestBase.spark

    val supported = Set("table_create", "column_create", "load", "select",
      "plugin_register", "register", "log_level", "column_remove", "config_set",
      "tokenize", "normalize", "table_tokenize", "suggest", "range_filter",
      "logical_count", "logical_select", "logical_range_filter",
      "logical_shard_list", "logical_parameters", "dump", "delete",
      "truncate", "table_list", "column_list", "table_remove", "object_exist",
      "object_remove", "object_inspect", "config_get", "config_delete",
      "tokenizer_list", "normalizer_list", "log_put", "cache_limit",
      "io_flush", "reindex", "column_rename", "column_copy", "schema",
      "plugin_unregister", "logical_table_remove", "ruby_eval", "ruby_load",
      "request_cancel", "database_unmap", "thread_limit")
    val roots = Seq("select", "tokenize", "normalize", "table_tokenize",
      "token_filters", "tokenizers", "suggest", "range_filter", "sharding",
      "dump", "load", "delete", "truncate", "tables", "geo",
      "table_list", "column_list", "table_remove", "object_exist",
      "object_remove", "object_inspect", "config_get", "config_delete",
      "log_put", "log_level", "cache_limit", "io_flush", "reindex",
      "column_rename", "column_copy", "column_remove", "schema",
      "tokenizer_list", "normalizer_list", "table_create", "column_create",
      "ruby", "config_set", "database_unmap", "plugin_register",
      "plugin_unregister", "request_cancel", "response")
    val fixtures = roots.iterator.flatMap(r =>
        Files.walk(suite.resolve(r)).iterator().asScala)
      .filter(p => p.toString.endsWith(".test"))
      .filter { p =>
        // command lines start with a lowercase identifier; everything else
        // (load JSON rows, comments, directives) is not a command
        val text = Files.readString(p)
        val cmds = text.replace("\\\n", " ").split('\n')
          .map(_.trim)
          .filter(l => l.nonEmpty && l.head.isLetter)
          .map(_.takeWhile(c => c.isLetter || c == '_')).toSet
        cmds.nonEmpty && cmds.subsetOf(supported) &&
          // external JP morphology plugins (documented unsupported,
          // SURVEY §2.11); guarded fixtures self-omit via #@on-error
          !text.contains("TokenMecab") && !text.contains("TokenKytea")
      }
      .map(p => suite.relativize(p).toString.stripSuffix(".test"))
      .filter(_.startsWith(prefix))
      .toSeq.sorted.take(max)

    System.err.println(s"sweeping ${fixtures.size} fixtures")
    val out = new StringBuilder
    var pass = 0; var fail = 0; var err = 0
    val t0 = System.nanoTime()
    fixtures.zipWithIndex.foreach { case (fx, i) =>
      val test = s"$suite/$fx.test"
      val expected = s"$suite/$fx.expected"
      val status =
        try {
          if (!Files.exists(Paths.get(expected))) ("error", "no .expected")
          else {
            val outcomes = GrnTestRunner.run(spark, test, expected)
            if (outcomes.isEmpty) ("error", "no selects")
            else outcomes.find(!_.ok) match {
              case None => ("pass", s"${outcomes.size} selects")
              case Some(bad) => ("fail", bad.detail.replace('\n', ' ').take(200))
            }
          }
        } catch {
          // `#@on-error omit` fixture (optional plugin absent): grntest
          // drops it from the run — report separately, not a failure
          case o: GrnTestRunner.OmittedFixture =>
            ("omit", String.valueOf(o.getMessage).replace('\n', ' ').take(200))
          case e: Throwable => ("error", s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).replace('\n', ' ').take(200)}")
        }
      status._1 match {
        case "pass" => pass += 1
        case "fail" => fail += 1
        case "omit" => ()
        case _ => err += 1
      }
      out.append(s"${status._1}\t$fx\t${status._2}\n")
      if ((i + 1) % 50 == 0)
        System.err.println(f"[${i + 1}/${fixtures.size}] pass=$pass fail=$fail err=$err (${(System.nanoTime() - t0) / 1e9}%.0fs)")
    }
    Files.createDirectories(Paths.get("target"))
    val outName =
      if (prefix.isEmpty) "target/compat_sweep.tsv"
      else "target/compat_sweep_partial.tsv"
    Files.writeString(Paths.get(outName), out.toString)
    println(s"PASS=$pass FAIL=$fail ERROR=$err of ${fixtures.size}")
  }
}
