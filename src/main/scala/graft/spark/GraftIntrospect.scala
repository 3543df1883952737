package graft.spark

import graft.format.{Codec, GraftFileReader, GraftStat}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** SQL-facing introspection frames over the format's metadata utilities —
  * the `graft_pages` / `graft_ndv` table functions' bodies
  * ([[GraftExtensions]] registers the names). Pure-SQL users get the same
  * answers the library APIs ([[graft.format.GraftStat]], [[GraftNdv]])
  * give: per-page codec/size/null layout, and footer-synopsis distinct
  * counts priced at O(files).
  *
  * `pages` reads every leaf's value bytes to parse codec trees (the same
  * cost as GraftStat.describe — it is a debugging/ops tool, not a query
  * operator); `ndv` stays footer-only.
  */
object GraftIntrospect {

  def codecName(c: Byte): String = c match {
    case Codec.None => "none"
    case Codec.Lz4 => "lz4"
    case Codec.Zstd => "zstd"
    case Codec.Snappy => "snappy"
    case Codec.Rle => "rle"
    case Codec.Dict => "dict"
    case Codec.OneValue => "onevalue"
    case Codec.Freq => "freq"
    case Codec.Bitpack => "bitpack"
    case Codec.DeltaBitpack => "deltabitpack"
    case Codec.Patas => "patas"
    case Codec.Wide => "wide"
    case other => s"codec$other"
  }

  /** Dotted leaf names in the writer's depth-first leaf order — MUST mirror
    * [[GraftSchema.leafSpecs]] exactly (offsets/validity machinery leaves
    * get `#offsets` / `#valid` suffixes; they aren't addressable columns).
    */
  def leafNames(dt: DataType, nullable: Boolean, prefix: String): Seq[String] = dt match {
    case ArrayType(et, cn) =>
      s"$prefix.#offsets" +: leafNames(et, cn, s"$prefix.element")
    case MapType(kt, vt, vcn) =>
      s"$prefix.#offsets" +: (leafNames(kt, nullable = false, s"$prefix.key") ++
        leafNames(vt, vcn, s"$prefix.value"))
    case s: StructType =>
      val marker = if (nullable) Seq(s"$prefix.#valid") else Seq.empty
      marker ++ s.fields.flatMap(f => leafNames(f.dataType, f.nullable, s"$prefix.${f.name}"))
    case _ => Seq(prefix)
  }

  /** One row per (file, leaf, page): physical layout introspection.
    * Columns: file, column (dotted leaf name), leaf, lane, page, codec,
    * compressed_len, raw_len, num_values, null_count.
    */
  def pages(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val files = GraftUtil.listDataFiles(dir, conf)
    require(files.nonEmpty, s"graft: no data files under $dir")
    val rows = files.flatMap { f =>
      val in = new HadoopSeekableInput(f.getPath.getFileSystem(conf), f.getPath, f.getLen)
      try {
        val footer = GraftFileReader.readFooter(in)
        val schema = DataType.fromJson(footer.schemaJson).asInstanceOf[StructType]
        val specs = schema.fields.flatMap(fd =>
          GraftSchema.leafSpecs(fd.dataType, fd.nullable)).toArray
        val names = schema.fields.flatMap(fd =>
          leafNames(fd.dataType, fd.nullable, fd.name))
        val infos = GraftStat.describe(in, footer, specs)
        infos.zipWithIndex.toSeq.flatMap { case (li, i) =>
          li.pages.zipWithIndex.toSeq.map { case (pg, pi) =>
            (f.getPath.getName, names(i), i, li.lane, pi, codecName(pg.codec),
              pg.compressedLen, pg.rawLen, pg.numValues, pg.nullCount)
          }
        }
      } finally in.close()
    }
    import spark.implicits._
    rows.toDF("file", "column", "leaf", "lane", "page", "codec",
      "compressed_len", "raw_len", "num_values", "null_count")
  }

  /** One row per column: the footer KMV distinct-count estimate
    * ([[GraftNdv.estimate]] as a frame — col_name, k, n_hashes, kth_hash,
    * estimate). */
  def ndv(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    val stats = GraftNdv.estimate(spark, dir, cols)
    import spark.implicits._
    stats.map(st => (st.column, st.k, st.nHashes.toLong, st.kth, st.estimate))
      .toDF("col_name", "k", "n_hashes", "kth_hash", "estimate")
  }
}
