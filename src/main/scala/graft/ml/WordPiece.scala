package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** T2: WordPiece tokenization in-engine — the re-expression of the
  * reference's external HuggingFace tokenizer call
  * (`/root/reference/tabsketchfm/data_processing/tabular_tokenizer.py:246`:
  * `encode_plus(text, max_length=512, padding='max_length',
  * truncation=True)`).
  *
  * Design: the vocabulary is DATA (a `(piece, id)` relation — load a
  * published vocab.txt or build one with [[buildVocab]]); encoding is a
  * distributed transform that broadcasts the vocab map once per job and
  * runs greedy longest-match-first segmentation per row. Special ids
  * follow the BERT convention ([PAD]=0, [UNK]=100, [CLS]=101, [SEP]=102
  * by default in a standard vocab; here they are wherever the vocab
  * relation puts them).
  */
object WordPiece {

  val Pad = "[PAD]"; val Unk = "[UNK]"; val Cls = "[CLS]"; val Sep = "[SEP]"

  /** Frequency-based vocab builder over a text column: all whole words by
    * descending frequency, plus every single character and its `##`
    * continuation form so segmentation can always terminate without
    * [UNK] for in-alphabet text. A pretrained vocab.txt can be loaded as
    * the same (piece, id) shape instead — the builder exists so the
    * engine is self-contained. Ids: specials first, then pieces by
    * (frequency desc, piece) — deterministic.
    */
  def buildVocab(texts: DataFrame, textCol: String, maxSize: Int = 30000): DataFrame = {
    val words = texts
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    val chars = words
      .select(explode(split(col("w"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .select(col("ch").as("piece")).distinct()
      .select(col("piece"), lit(Long.MaxValue).as("freq"))
    val contChars = chars.select(concat(lit("##"), col("piece")).as("piece"), col("freq"))
    val wholeWords = words.groupBy(col("w").as("piece"))
      .agg(count(lit(1)).as("freq"))
    val ranked = chars.unionByName(contChars).unionByName(wholeWords)
      .groupBy("piece").agg(max("freq").as("freq"))
      .orderBy(col("freq").desc, col("piece"))
      .limit(maxSize - 4)
    val spark = texts.sparkSession
    import spark.implicits._
    val specials = Seq(Pad, Unk, Cls, Sep).zipWithIndex
      .map { case (p, i) => (p, i.toLong) }.toDF("piece", "id")
    // window-free vocab ids: global sort (range-partitioned — no single-
    // partition funnel even at real 30k+ vocab sizes) + zipWithIndex
    // positions (see Ranking.withPosition)
    specials.unionByName(
      graft.operators.Ranking.withPosition(
          ranked.select(col("piece"), col("freq"))
            .orderBy(col("freq").desc, col("piece")), "__pos")
        .select(col("piece"), (col("__pos") + 3).as("id")))
  }

  /** Greedy longest-match-first segmentation of one word (lowercased by
    * the caller). Standard WordPiece: the longest vocab prefix wins, the
    * remainder continues with `##` pieces; any dead end yields [UNK] for
    * the whole word. Pure function — unit-testable off-cluster.
    */
  def segmentWord(word: String, vocab: collection.Map[String, Long]): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var start = 0
    while (start < word.length) {
      val prefix = if (start == 0) "" else "##"
      var end = word.length
      var found = -1L
      while (end > start && found < 0) {
        vocab.get(prefix + word.substring(start, end)) match {
          case Some(id) => found = id
          case None     => end -= 1
        }
      }
      if (found < 0) return Seq(vocab(Unk))
      out += found
      start = end
    }
    out.toSeq
  }

  /** Encode a text column: `[CLS] pieces… [SEP]`, truncated then padded to
    * `maxLen` (the reference's `encode_plus` contract). Appends
    * `input_ids: array<long>` and `attention_mask: array<int>`. The vocab
    * relation is collected once (bounded: vocab size ≪ data) and
    * broadcast inside the task closure.
    */
  def encode(df: DataFrame, textCol: String, vocab: DataFrame,
             maxLen: Int = 512,
             idsCol: String = "input_ids", maskCol: String = "attention_mask"): DataFrame = {
    val vmap: Map[String, Long] = vocab.select("piece", "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(Seq(Pad, Unk, Cls, Sep).forall(vmap.contains), "vocab must define specials")
    val bc = df.sparkSession.sparkContext.broadcast(vmap)
    val schema = df.schema
    val outSchema = schema
      .add(idsCol, ArrayType(LongType, containsNull = false))
      .add(maskCol, ArrayType(IntegerType, containsNull = false))
    val ti = schema.fieldIndex(textCol)
    val ml = maxLen
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      val v = bc.value
      val (pad, cls, sep) = (v(Pad), v(Cls), v(Sep))
      it.map { r =>
        val text = Option(r.get(ti)).map(_.toString).getOrElse("")
        val pieces = text.toLowerCase.split("\\s+").iterator
          .filter(_.nonEmpty).flatMap(segmentWord(_, v)).toSeq
        val body = pieces.take(ml - 2)
        val ids = (cls +: body :+ sep).padTo(ml, pad)
        val mask = Array.fill(body.length + 2)(1).padTo(ml, 0).toSeq
        Row.fromSeq(r.toSeq :+ ids :+ mask)
      }
    }
  }
}
