package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.StringToColumn

/** Tokenizer-training operators: distributed BPE merge learning (x62) and
  * corpus encoding with the learned merges (x63) — the tokenizer-fitting
  * step every LLM data pipeline runs before token counting / packing.
  *
  * Algorithm (classical BPE, Sennrich et al. 2016): start from the
  * word-frequency table with each word spelled as characters plus a
  * word-end marker `#`; repeatedly (a) count adjacent symbol pairs
  * weighted by word frequency, (b) merge the most frequent pair
  * (ties: lexicographic) everywhere it occurs, left-to-right,
  * non-overlapping.
  *
  * Scale design (100 TB): the corpus is touched ONCE — a token explode +
  * word groupBy (map-side combinable, one shuffle) produces the
  * vocab-sized word-frequency table, exactly how production BPE trainers
  * (HF tokenizers, SentencePiece in word mode) structure the count. Every
  * merge iteration then runs over the VOCAB (≪ corpus; bounded by it),
  * with one pair-key shuffle and a 1-row argmax collect per round —
  * the same bounded-collect training-loop discipline as the k-means
  * books (VectorOps.kmeansBook). Encoding (x63) broadcasts the trained
  * word→subwords map sized by the vocab; the corpus side is a
  * map-side join + one doc-level partial agg — no corpus shuffle
  * before the final per-doc rollup.
  *
  * Engine-identity trick: a word's symbol sequence is one string in a
  * canonical *double-separator* form `~~s1~~s2~~…~~sk~~` (tokens are
  * `[a-z]+` so `~` and `#` cannot occur in symbols). Merging pair (l, r)
  * is then `replace(s, "~l~~r~", "~lr~")`: both Spark and DuckDB scan
  * left-to-right replacing non-overlapping occurrences — each match
  * consumes ONE of the two boundary separators on each flank, so back--
  * to-back occurrences (`aaaa` under (a,a)→`aa aa`) merge exactly like
  * classical BPE, while the surviving outer separator keeps symbol
  * boundaries anchored (no false intra-symbol matches: `l` must start a
  * symbol, `r` must end one). The oracle replays the whole training loop
  * CTE-for-CTE; merge selection and pair counts are exact integers.
  */
object TokenOps {

  /** Number of merge rounds the registry queries learn. */
  private[graft] val Merges = 6

  /** Canonical double-separator spelling of a word: chars + `#` marker,
    * each symbol flanked by `~~`. */
  private def canonical(word: Column): Column =
    concat(lit("~~"), regexp_replace(concat(word, lit("#")), "(.)", "$1~~"))

  private def canonicalSql(wordExpr: String): String =
    s"'~~' || array_to_string(string_split($wordExpr || '#', ''), '~~') || '~~'"

  /** Symbols of a canonical string (split on `~~`, drop the flanking
    * empties). */
  private def symbols(s: Column): Column =
    filter(split(s, "~~"), x => length(x) > 0)

  private def symbolsSql(sExpr: String): String =
    s"list_filter(string_split($sExpr, '~~'), x -> x <> '')"

  /** Word-frequency table (w, f) from `[a-z]+` runs of lowercased text —
    * the ONE corpus pass of the trainer. */
  private[graft] def wordFreq(s: SparkSession, dir: String): DataFrame = {
    Tables.spread(s, dir, "documents")
      .select(explode(regexp_extract_all(lower($"text"),
        lit("[a-z]+"), lit(0))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("f"))
  }

  /** One learned merge. */
  private[graft] final case class Merge(step: Long, l: String, r: String,
      cnt: Long)

  /** Train `k` BPE merges: vocab-sized Lloyd's-style driver loop, one
    * pair-count shuffle + one 1-row collect per round. Returns the
    * merge table and the vocab frame spelled in post-merge symbols
    * (w, s, f) for the encoder. */
  private[graft] def trainBpe(s: SparkSession, dir: String, k: Int = Merges)
      : (Seq[Merge], DataFrame) = {
    val wf = wordFreq(s, dir).withColumn("s", canonical($"w")).cache()
    try {
      var cur = wf.select($"w", $"s", $"f")
      val merges = (1 to k).map { step =>
        val sy = cur.select(symbols($"s").as("sy"), $"f")
        val best = sy
          .select(explode(transform(sequence(lit(1), size($"sy") - 1),
            i => struct(element_at($"sy", i).as("l"),
              element_at($"sy", i + 1).as("r")))).as("p"), $"f")
          .groupBy($"p.l", $"p.r").agg(sum($"f").as("cnt"))
          .orderBy($"cnt".desc, $"l", $"r").limit(1)
          .collect()(0)
        val (l, r) = (best.getString(0), best.getString(1))
        cur = cur.withColumn("s",
          replace($"s", lit(s"~$l~~$r~"), lit(s"~$l$r~")))
        Merge(step.toLong, l, r, best.getLong(2))
      }
      (merges, cur.select($"w", $"s", $"f"))
    } finally wf.unpersist()
  }

  /** The unrolled-oracle CTE chain shared by x62 and x63: w0 is the
    * canonical vocab, then per round i: pair counts pc_i, argmax m_i,
    * merged vocab w_i (CROSS JOIN against the 1-row m_i — scalar
    * subqueries would re-expand the chain per reference). */
  private def sqlBpeCtes(k: Int): String = {
    val base = Seq(
      "tk AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+'))" +
        " AS w FROM documents)",
      "wf AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM tk GROUP BY 1)",
      s"w0 AS (SELECT w, ${canonicalSql("w")} AS s, f FROM wf)")
    val rounds = (1 to k).flatMap { i =>
      val p = i - 1
      Seq(
        s"""pc$i AS (SELECT sy[CAST(i AS INT)] AS l,
           |    sy[CAST(i+1 AS INT)] AS r, CAST(sum(f) AS BIGINT) AS cnt
           |  FROM (SELECT sy, f, unnest(range(1, len(sy))) AS i
           |    FROM (SELECT ${symbolsSql("s")} AS sy, f FROM w$p))
           |  GROUP BY 1, 2)""".stripMargin,
        s"m$i AS (SELECT l, r, cnt FROM pc$i ORDER BY cnt DESC, l, r" +
          s" LIMIT 1)",
        s"w$i AS (SELECT w, replace(s, '~'||l||'~~'||r||'~'," +
          s" '~'||l||r||'~') AS s, f FROM w$p CROSS JOIN m$i)")
    }
    (base ++ rounds).mkString(",\n")
  }

  val qs: Map[String, Q] = Map(
    // ----- x62 BPE merge training: the learned merge table. Oracle
    // replays the entire training loop (pair counting, argmax with the
    // (cnt DESC, l, r) tie-break, left-to-right non-overlapping merge
    // application) round for round; counts are exact integers, so the
    // learned merges are engine-identical by construction.
    "x62_bpe_train" -> Q({
      val sel = (1 to Merges).map(i =>
        s"SELECT CAST($i AS BIGINT) AS step, l AS left_sym," +
          s" r AS right_sym, cnt AS pair_freq FROM m$i")
        .mkString(" UNION ALL ")
      s"""WITH ${sqlBpeCtes(Merges)}
         |SELECT * FROM ($sel) ORDER BY step""".stripMargin
    }) { (s, dir) =>
        val (merges, _) = trainBpe(s, dir)
      s.createDataFrame(merges.map(m => (m.step, m.l, m.r, m.cnt)))
        .toDF("step", "left_sym", "right_sym", "pair_freq")
        .orderBy($"step")
    },

    // ----- x63 BPE encode: spell every document in the learned subword
    // units and report per-doc token statistics (the tokens-per-doc
    // accounting that feeds context-window packing x17 and mixture
    // design x54). The corpus side never shuffles before the final
    // per-doc rollup: tokens map-join the broadcast vocab→n_subwords
    // table (vocab-sized) and aggregate partially map-side.
    "x63_bpe_encode" -> Q(
      s"""WITH ${sqlBpeCtes(Merges)},
         |enc AS (SELECT w, CAST(len(${symbolsSql("s")}) AS BIGINT)
         |    AS n_sub FROM w$Merges),
         |dt AS (SELECT doc_id,
         |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
         |  FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(n_sub) AS BIGINT) AS n_tokens,
         |  round(sum(n_sub) * 1.0 / count(*), 4) AS tokens_per_word
         |FROM dt JOIN enc USING (w)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
        val (_, vocab) = trainBpe(s, dir)
      val enc = vocab.select($"w", size(symbols($"s")).cast("long")
        .as("n_sub"))
      Tables.spread(s, dir, "documents")
        .select($"doc_id", explode(regexp_extract_all(lower($"text"),
          lit("[a-z]+"), lit(0))).as("w"))
        .join(broadcast(enc), Seq("w"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_words"), sum($"n_sub").as("n_tokens"))
        .select($"doc_id", $"n_words", $"n_tokens",
          round($"n_tokens" * lit(1.0) / $"n_words", 4)
            .as("tokens_per_word"))
        .orderBy($"doc_id")
    },

    // ----- x109 per-source tokenizer fertility: how many learned
    // subwords the tokenizer spends per word (and how many characters
    // each token covers) for EVERY source — the standard tokenizer-
    // coverage evaluation (Rust et al. 2021's fertility metric): a
    // source with outlier fertility is poorly covered by the trained
    // vocab, trains on fragment soup, and silently over-costs its
    // share of the x106 token budget. Same scale shape as x63 (the
    // vocab broadcast-joins, the corpus never shuffles before one
    // source-sized rollup); ratios in exact ppm over 128-bit-wide
    // numerators (the x67 discipline — 1e14 tokens × 1e6 passes 2^63).
    "x109_tokenizer_fertility" -> Q(
      s"""WITH ${sqlBpeCtes(Merges)},
         |enc AS (SELECT w, CAST(len(${symbolsSql("s")}) AS BIGINT)
         |    AS n_sub FROM w$Merges),
         |dt AS (SELECT source,
         |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
         |  FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(n_sub) AS BIGINT) AS n_tokens,
         |  CAST(sum(length(w)) AS BIGINT) AS n_chars,
         |  CAST((CAST(sum(n_sub) AS HUGEINT) * 1000000) // count(*)
         |    AS BIGINT) AS fertility_ppm,
         |  CAST((CAST(sum(length(w)) AS HUGEINT) * 1000000)
         |    // sum(n_sub) AS BIGINT) AS chars_per_token_ppm
         |FROM dt JOIN enc USING (w)
         |GROUP BY 1 ORDER BY source""".stripMargin) { (s, dir) =>
      val (_, vocab) = trainBpe(s, dir)
      val enc = vocab.select($"w", size(symbols($"s")).cast("long")
        .as("n_sub"))
      Tables.spread(s, dir, "documents")
        .select($"source", explode(regexp_extract_all(lower($"text"),
          lit("[a-z]+"), lit(0))).as("w"))
        .join(broadcast(enc), Seq("w"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_words"), sum($"n_sub").as("n_tokens"),
          sum(length($"w")).as("n_chars"))
        .select($"source", $"n_words", $"n_tokens", $"n_chars",
          expr("(CAST(n_tokens AS DECIMAL(38,0)) * 1000000)" +
            " div n_words").as("fertility_ppm"),
          expr("(CAST(n_chars AS DECIMAL(38,0)) * 1000000)" +
            " div n_tokens").as("chars_per_token_ppm"))
        .orderBy($"source")
    })
}
