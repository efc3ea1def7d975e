package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline column expressions (tokenize, shingle, hash families)
  * shared by the dedup / text-analysis operators. Everything is a pure
  * `Column` composition — codegen'd, no UDFs — and every hash is defined
  * identically in ANSI SQL (see [[TextSql]]) so the DuckDB oracle can
  * verify values exactly.
  *
  * Canonical 48-bit content hash: the first 12 hex chars of md5,
  * interpreted as an integer. 48 bits keeps every downstream product
  * (`a*h+b` in MinHash) inside exact int64/double range in BOTH engines.
  */
object TextExprs {

  /** Whitespace tokens of trimmed text (empty text -> empty array). */
  def wsTokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** BPE-ish subword-ish tokens: letter runs, digit runs, single
    * punctuation marks — the usual pre-tokenizer regex. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** 48-bit integer from the md5 prefix — the canonical content hash. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Adjacent token pairs as `array<struct<w1,w2>>`; docs shorter than
    * 2 tokens produce an EMPTY array (the guard lives here, not at call
    * sites: `sequence(1, size-1)` on a 1-token doc counts DOWN to
    * [1, 0] and `element_at(tk, 0)` throws). Shared by the bigram
    * stats (x32), the LM quality score (x36), and the streaming ingest
    * LM gate, so the window construction cannot drift between batch
    * and stream. */
  def bigramPairs(tokens: Column): Column =
    when(size(tokens) >= 2,
      transform(sequence(lit(1), size(tokens) - 1),
        i => struct(element_at(tokens, i).as("w1"),
          element_at(tokens, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** The same pairs as space-joined strings (map keys / group keys). */
  def bigrams(tokens: Column): Column =
    transform(bigramPairs(tokens),
      p => concat_ws(" ", p.getField("w1"), p.getField("w2")))

  /** Distinct word k-shingles (k consecutive tokens joined by one space);
    * docs shorter than k tokens produce no shingles. */
  def shingles(tokens: Column, k: Int): Column =
    when(size(tokens) >= k,
      array_distinct(transform(sequence(lit(1), size(tokens) - (k - 1)),
        i => concat_ws(" ",
          (0 until k).map(o => element_at(tokens, i + o)): _*))))
      .otherwise(array().cast("array<string>"))

  /** MinHash family: h_i(x) = (a_i * (x mod p) + b_i) mod p over the
    * 48-bit shingle hashes. Constants are small enough that a*(x mod p)
    * stays < 2^46 — exact in int64 and in float64 (for the SQL oracle). */
  val MinhashP: Long = 2147483647L // 2^31 - 1
  def minhashA(i: Int): Long = 2L * i + 3
  def minhashB(i: Int): Long = 104729L * i + 12345

  /** Pre-hashed shingles: md5Long mod p, computed ONCE per shingle and
    * shared by all signature components (16x cheaper than hashing
    * inside each minhash). */
  def shingleHashes(shingleArr: Column): Column =
    transform(shingleArr, s => md5Long(s) % MinhashP)

  /** One MinHash signature component over pre-hashed shingles. */
  def minhash(hashedArr: Column, i: Int): Column =
    array_min(transform(hashedArr,
      h => (lit(minhashA(i)) * h + minhashB(i)) % MinhashP))

  /** SimHash over tokens, `bits` wide: bit b set iff the sum of
    * (+1 / -1) votes from each token's hash bit b is positive. Tokens
    * are md5-hashed ONCE (not once per bit), then all vote counters
    * update in a single codegen pass ([[SimHashBits]]). */
  /** Deterministic train/val/test assignment from the doc id alone
    * (x59's convention): bucket = md5(id ‖ "_split") mod 100 →
    * [0,80) train, [80,90) val, rest test. ONE definition shared by
    * the batch query, the streaming ingest stamp, and the stability
    * spec, so the assignment can never drift between surfaces. */
  def splitOf(docId: Column): Column = {
    val b = md5Long(org.apache.spark.sql.functions.concat(
      docId.cast("string"),
      org.apache.spark.sql.functions.lit("_split"))) % 100
    org.apache.spark.sql.functions.when(b < 80, "train")
      .when(b < 90, "val").otherwise("test")
  }

  def simhash(tokens: Column, bits: Int): Column =
    SimHashBits(transform(tokens, t => md5Long(t)), bits)
}

/** The same hash definitions as ANSI SQL fragments for the DuckDB oracle.
  * Kept adjacent to [[TextExprs]] so the two stay in lockstep.
  */
object TextSql {

  /** 48-bit md5-prefix integer of expression `e` (exact: every partial
    * sum < 2^48 is exactly representable in the double list_sum). The
    * lambda variable is deliberately obscure: DuckDB resolves an outer
    * column with the lambda variable's name INTO the lambda body
    * (capture), silently corrupting the hash — a plain `j` here broke
    * the first CMS draft, whose queries carry a `j` column. */
  def md5Long(e: String): String =
    s"CAST(list_sum(list_transform(range(1,13), md5j_ -> " +
      s"(strpos('0123456789abcdef', substr(md5($e), CAST(md5j_ AS INT), 1))" +
      s" - 1) * power(16, 12 - md5j_))) AS BIGINT)"

  def minhash(shingleVar: String, i: Int): String =
    s"list_min(list_transform($shingleVar, s -> " +
      s"(${TextExprs.minhashA(i)} * (${md5Long("s")} % ${TextExprs.MinhashP})" +
      s" + ${TextExprs.minhashB(i)}) % ${TextExprs.MinhashP}))"

  /** Distinct word k-shingles of a token list (DuckDB `range` excludes
    * its stop bound, hence the +2-k offset vs the Spark sequence). */
  def shingles(tokensVar: String, k: Int): String = {
    val parts = (0 until k)
      .map(o => s"$tokensVar[CAST(i + $o AS INT)]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, len($tokensVar) + 2 - $k), " +
      s"i -> $parts))"
  }

  def wsTokens(textExpr: String): String =
    s"CASE WHEN trim($textExpr) = '' THEN [] " +
      s"ELSE string_split_regex(trim($textExpr), '\\s+') END"

  def simhash(tokensVar: String, bits: Int): String = {
    val terms = (0 until bits).map { b =>
      s"(CASE WHEN list_sum(list_transform($tokensVar, t -> " +
        s"((${md5Long("t")} >> $b) & 1) * 2 - 1)) > 0 " +
        s"THEN CAST(power(2, $b) AS BIGINT) ELSE 0 END)"
    }
    terms.mkString("(", " + ", ")")
  }
}
