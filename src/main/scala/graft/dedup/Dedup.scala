package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ann.Vectors
import graft.text.TextAnalysis

/** Deduplication operators for large-scale training-data pipelines
  * (builder mandate): exact, MinHash+LSH, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup.
  *
  * Scale notes: the LSH variants (minhashLshPairs, simhashPairs) are the
  * 100 TB path — candidate generation is an equi-join on small band
  * keys, so the shuffle carries (doc, band) rows, never the cross
  * product. The exact-Jaccard self-join (ngramJaccardPairs) is the
  * verification/oracle path and should be run on bounded slices. */
object Dedup {

  /** Exact dedup by content hash: one row per distinct content, with
    * the surviving (minimum) id and the duplicate count. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))

  /** Distinct word n-gram shingles of a token array (docs shorter than
    * n collapse to a single whole-doc shingle). */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array(concat_ws(" ", toks)))

  /** MinHash signature: k seeded-xxhash64 minima over the shingle set. */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      s => array_min(transform(shingles, sh => xxhash64(s, sh))))

  /** MinHash + LSH near-dup pairs: signature → band keys → equi-join on
    * (band, bandkey) for candidates → exact Jaccard verification →
    * threshold filter. Returns (id_a, id_b, jaccard). */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, shingleN: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    val withSh = docs.select(col(idCol).as("did"),
      wordShingles(TextAnalysis.tokens(col(textCol)), shingleN).as("sh"))
    val banded = withSh
      .withColumn("sig", minhashSignature(col("sh"), k))
      .select(col("did"), col("sh"), explode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), xxhash64(slice(col("sig"), b * rows + 1, lit(rows))).as("bkey"))))
        .as("bb"))
      .select(col("did"), col("sh"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.did") < col("b.did"))
      .select(col("a.did").as("id_a"), col("b.did").as("id_b"),
        col("a.sh").as("sha"), col("b.sh").as("shb"))
      .dropDuplicates("id_a", "id_b")
    val common = size(array_intersect(col("sha"), col("shb"))).cast("double")
    pairs.select(col("id_a"), col("id_b"),
        round(common / (size(col("sha")) + size(col("shb")) - common), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over the token multiset: majority vote per bit of
    * the token hashes. Pure expression tree (64 bit-lanes). */
  def simhash(toks: Column): Column = {
    val hashes = transform(toks, t => xxhash64(t))
    (0 until 64).map { i =>
      val ones = size(filter(hashes, h => shiftright(h, i).bitwiseAND(lit(1L)) === 1L))
      when(ones * 2 > size(hashes), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** SimHash near-dup pairs: 4×16-bit band blocking, then Hamming
    * verification via bit_count(xor). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8): DataFrame = {
    val withSim = docs.select(col(idCol).as("did"),
      simhash(TextAnalysis.tokens(col(textCol))).as("sim"))
    // band key = the b-th 16-bit chunk of the 64-bit simhash
    val banded = withSim.select(col("did"), col("sim"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        shiftright(col("sim"), b * 16).bitwiseAND(lit(0xffffL)).as("bkey"))): _*)).as("bb"))
      .select(col("did"), col("sim"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.did") < col("b.did"))
      .select(col("a.did").as("id_a"), col("b.did").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard near-dup pairs via shingle equi-join — fully
    * deterministic (no hashing), the oracle-checkable twin of the LSH
    * path. jaccard = |A∩B| / (|A|+|B|-|A∩B|). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2, threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col(idCol).as("did"),
        explode(wordShingles(TextAnalysis.tokens(col(textCol)), shingleN)).as("s"))
    val cnt = sh.groupBy(col("did")).agg(count(lit(1)).as("n"))
    val common = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.did") < col("b.did"))
      .groupBy(col("a.did").as("id_a"), col("b.did").as("id_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(cnt.select(col("did").as("id_a"), col("n").as("na")), "id_a")
      .join(cnt.select(col("did").as("id_b"), col("n").as("nb")), "id_b")
      .filter(col("c").cast("double") / (col("na") + col("nb") - col("c")) >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 4).as("jaccard"))
  }

  /** Embedding-cosine near-dup pairs over a bounded id slice (the
    * all-pairs verification shape; LSH/IVF blocking is the scale path —
    * see graft.ann.Ann). */
  def embeddingCosinePairs(embs: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = embs.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = embs.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Vectors.cosine(col("va"), col("vb")), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
