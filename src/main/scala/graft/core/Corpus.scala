package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthesized source-code corpus (FIXTURES.md §3): keyword-heavy
  * content with a zipf-skewed identifier vocabulary so hot-term salting is
  * actually exercised. Pure function of (seed, rowId) — generation is fully
  * distributed via `spark.range`, no driver-side data, no wall-clock or RNG
  * state (reproducible at any scale).
  */
object Corpus {

  private val langs = Array("scala", "c", "py", "js")
  private val exts = Map("scala" -> "scala", "c" -> "c", "py" -> "py", "js" -> "js")

  private val keywords = Map(
    "scala" -> Array("def", "val", "var", "if", "else", "match", "case", "return", "for", "while", "class", "object", "import", "new", "override"),
    "c" -> Array("int", "char", "void", "if", "else", "return", "for", "while", "struct", "static", "const", "switch", "case", "break", "sizeof"),
    "py" -> Array("def", "if", "else", "elif", "return", "for", "while", "class", "import", "from", "lambda", "yield", "with", "try", "except"),
    "js" -> Array("function", "var", "let", "const", "if", "else", "return", "for", "while", "class", "import", "export", "new", "async", "await")
  )

  private val vocabSize = 5000

  @inline private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Stateless RNG stream: nth draw for a given (seed, row, stream). */
  @inline private def draw(seed: Long, row: Long, stream: Long): Long =
    splitmix64(splitmix64(seed ^ row) ^ (stream * 0x632be59bd9b4e019L))

  @inline private def uniform(bits: Long): Double =
    ((bits >>> 11).toDouble) / (1L << 53).toDouble

  /** Zipf-ish rank in [0, vocabSize): log-uniform → density ~ 1/r. */
  @inline private def zipfRank(u: Double): Int = {
    val r = math.pow(vocabSize.toDouble, u).toInt
    math.min(r, vocabSize - 1)
  }

  /** Deterministic identifier for a vocabulary rank — public so benchmarks
    * can derive guaranteed-present query terms of known rarity.
    */
  def ident(rank: Int): String = {
    // deterministic identifier per rank; low ranks are short & common
    val h = splitmix64(rank.toLong * 0x9e3779b97f4a7c15L + 12345L)
    val len = 2 + (rank % 9)
    val sb = new StringBuilder(len)
    var x = h
    var i = 0
    while (i < len) {
      sb.append(('a' + (java.lang.Long.remainderUnsigned(x, 26L)).toInt).toChar)
      x = splitmix64(x)
      i += 1
    }
    sb.toString
  }

  def file(seed: Long, i: Long): CodeFile = {
    val lang = langs((draw(seed, i, 0) & 0x7fffffff).toInt % langs.length)
    val kws = keywords(lang)
    val org = java.lang.Long.remainderUnsigned(draw(seed, i, 1), 200L)
    val repoN = java.lang.Long.remainderUnsigned(draw(seed, i, 2), 50L)
    val repo = f"org$org%03d/repo$repoN%03d"
    val dirN = java.lang.Long.remainderUnsigned(draw(seed, i, 3), 20L)
    val path = s"src/m$dirN/File$i.${exts(lang)}"
    val commit = f"${draw(seed, i, 4)}%016x${draw(seed, i, 5)}%016x".take(40)
    val nLines = 5 + java.lang.Long.remainderUnsigned(draw(seed, i, 6), 40L).toInt
    val sb = new StringBuilder(nLines * 40)
    var ln = 0
    var stream = 16L
    while (ln < nLines) {
      val kw = kws((draw(seed, i, stream) & 0x7fffffff).toInt % kws.length); stream += 1
      val id1 = ident(zipfRank(uniform(draw(seed, i, stream)))); stream += 1
      val id2 = ident(zipfRank(uniform(draw(seed, i, stream)))); stream += 1
      val num = java.lang.Long.remainderUnsigned(draw(seed, i, stream), 1000L); stream += 1
      val shape = (draw(seed, i, stream) & 0x7fffffff).toInt % 4; stream += 1
      val line = shape match {
        case 0 => s"$kw $id1 = $id2($num);"
        case 1 => s"if ($id1 != $num) return $id2;"
        case 2 => s"$kw $id1($id2) { $id2 = $id1 + $num }"
        case _ => s"while ($id1 < $num) { $id2 += 1 }"
      }
      sb.append(line).append('\n')
      ln += 1
    }
    CodeFile(repo, path, commit, lang, sb.toString)
  }

  def generate(spark: SparkSession, n: Long, seed: Long = 42L, partitions: Int = 32): Dataset[CodeFile] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => file(seed, i))
  }
}
