package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence assembly for training pipelines: split long documents into
  * token-bounded chunks, and pack short documents into capacity-bounded
  * bins (the "sequence packing" step before tokenizer batching).
  */
object Chunking {

  /** Sliding word-window chunking: windows of `size` tokens every `stride`
    * tokens, final partial window kept iff it adds tokens beyond the
    * previous window. One map-only explode — each doc's chunk count is
    * ⌈(n−chunkSize)/stride⌉+1, so output scales with corpus token count
    * regardless of document length skew.
    */
  def chunkWords(df: DataFrame, id: String, text: String,
                 chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkSize >= stride, s"need 0 < stride <= chunkSize")
    graft.window.Moving.guardNames(df.columns.toSeq,
      Seq("__toks", "__starts", "__start", "chunk_tokens", "chunk_idx",
        "n_tokens", "chunk_text"), "chunkWords")
    // empty/whitespace-only text chunks to NOTHING — split("") yields
    // [""], which would emit a phantom 1-token chunk of "" (same trap
    // TextOps.tokenCountWs guards); a NULL text likewise yields no rows
    val withToks = df.withColumn("__toks",
      when(length(trim(col(text))) === 0, array().cast("array<string>"))
        .otherwise(split(trim(col(text)), "\\s+")))
    val n = size(col("__toks"))
    // starts: 0, stride, 2·stride, …, last start < n
    val nChunks = ceil((n - lit(chunkSize)).cast("double") / stride).cast("int") + 1
    withToks
      .withColumn("__starts",
        when(n > chunkSize, transform(sequence(lit(0), nChunks - 1), i => i * stride))
          .when(n > 0, array(lit(0)))
          .otherwise(array().cast("array<int>")))
      .select(col(id), posexplode(col("__starts")).as(Seq("chunk_idx", "__start")),
        col("__toks"))
      .withColumn("chunk_tokens",
        slice(col("__toks"), col("__start") + 1, lit(chunkSize)))
      .select(col(id), col("chunk_idx"),
        size(col("chunk_tokens")).cast("long").as("n_tokens"),
        concat_ws(" ", col("chunk_tokens")).as("chunk_text"))
  }

  /** Greedy capacity packing within each `keys` group, in `pos` order:
    * running fill accumulates `lenCol`; when it would exceed `capacity`
    * a new bin starts (an oversized item occupies its own bin). The fold
    * runs as a keyed single-pass scan — one shuffle, zero driver state,
    * parallel across groups — which is how 100 TB of documents pack
    * without any global coordination: bins are local to a (key) shard by
    * design, matching how training shards are built per source/stream.
    */
  def packGreedy(df: DataFrame, keys: Seq[String], lenCol: String,
                 capacity: Long, out: String = "bin"): DataFrame = {
    require(keys.nonEmpty, "packGreedy packs within key groups; pass >= 1 key")
    // the scan folds in (keys, pos) order — fail here with a clear
    // message rather than a resolution error inside the scan machinery;
    // pos must be unique per key or the greedy order (and thus the bin
    // assignment) is nondeterministic
    require(df.columns.exists(_.equalsIgnoreCase("pos")),
      "packGreedy folds in (keys, pos) order; attach a pos column first " +
        "(Series.attachPos)")
    graft.window.Moving.guardNames(df.columns.toSeq, Seq(out), "packGreedy")
    val lIdx = df.schema.fieldIndex(lenCol)
    graft.window.Moving.monoidScanKeyed(df, keys, Seq("__fill", "__bin"))(
      Array(0.0, 0.0)) { r =>
      Array(graft.window.Moving.numAt(r, lIdx, "packGreedy"), 0.0)
    } { (acc, x) =>
      val len = x(0)
      // reset iff the bin is non-empty and this item would overflow it
      if (acc(0) > 0 && acc(0) + len > capacity) Array(len, acc(1) + 1)
      else Array(acc(0) + len, acc(1))
    }
      .withColumn(out, col("__bin").cast("long"))
      .drop("__fill", "__bin")
  }
}
