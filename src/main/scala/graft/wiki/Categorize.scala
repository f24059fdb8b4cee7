package graft.wiki

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's flagship Categorizer pipeline (categorizer.py:124-191)
  * re-expressed as ONE Catalyst-planned dataflow.
  *
  * The reference splits this across a Spark job and a driver-side Python
  * loop: `process_html_files()` builds the frame (categorizer.py:124-141),
  * then `save_to_sql()` COLLECTS it and runs three sequential SQLAlchemy
  * passes with per-row point SELECTs to dedupe pages/categories and wire
  * the M2M bridge (categorizer.py:150-188) — the driver bottleneck
  * SURVEY.md §3.1 calls out. Here the dedup is an anti-join, the
  * AUTO_INCREMENT surrogate keys are deterministic `row_number()`s, and
  * the bridge is two hash joins — all executor-side, no collect().
  */
object Categorize {

  /** O-1 + O-2: whole-file text scan with source path attached
    * (categorizer.py:131). One row per *.html file; `value` is the whole
    * file. At 100 TB the wholetext text source is one-task-per-file —
    * fine for page-sized files; for huge blobs switch to
    * `format("binaryFile")` + repartition (SURVEY.md §7 risk (e)).
    */
  def readPages(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(s"$dir/*.html")
      .withColumn("file_path", input_file_name())

  /** The 100 TB ingest twin of [[readPages]] (SURVEY.md §7 risk (e)):
    * `binaryFile` + UTF-8 decode instead of the wholetext text source.
    * Same (value, file_path) frame — CategorizeSpec pins row-for-row
    * parity on the HTML fixtures — but the scan carries the blob as
    * `binary` with per-file metadata, streams through the
    * PartitionedFile machinery instead of one whole-file string read,
    * and composes with `pathGlobFilter`/`modifiedAfter` pushdown for
    * incremental crawls. For page-sized HTML the two are equivalent;
    * for mixed blob sizes binaryFile is the one that survives, because
    * the downstream repartition spreads decode work across the cluster
    * while wholetext must hold each file as one task-local String.
    *
    * `file_path` is normalized to the SAME URI form
    * `input_file_name()` emits — binaryFile's `path` is the Hadoop
    * Path string, which (a) renders a local path as `file:/…` where
    * input_file_name gives `file:///…` and (b) leaves spaces raw where
    * the URI form percent-encodes them. Both fixed here so every
    * downstream consumer (`sanitize_filename` first, whose `%` → `_`
    * mapping would otherwise diverge) sees identical bytes from either
    * scan. Space is the only URI-escaped character a crawler-written
    * filename can carry (the crawl sink sanitizes names before
    * writing); a corpus with arbitrary reserved characters would swap
    * this for a full RFC-3986 encode.
    */
  def readPagesBinary(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.html")
      .load(dir)
      .select(
        decode(col("content"), "UTF-8").as("value"),
        regexp_replace(
          regexp_replace(col("path"), "^file:/(?!/)", "file:///"),
          " ", "%20").as("file_path"))

  /** The categorizer frame (categorizer.py:124-141): sanitize filename
    * (O-5), extract categories (O-6), whitespace word count over the RAW
    * html (O-8, categorizer.py:137), last-edited date (O-7).
    *
    * All three html probes come from ONE native `parse_page` evaluation
    * (the reference re-parses a fresh BeautifulSoup tree per UDF — its
    * documented flaw; the round-3 ScalaUDF version here still paid two
    * UDF converter round-trips plus a separate `split` pass per page).
    */
  def processHtmlFiles(spark: SparkSession, dir: String): DataFrame =
    readPages(spark, dir)
      .withColumn("p", graft.functions.GraftFunctions.parsePage(col("value")))
      .select(
        Html.sanitizeFilename(col("file_path")).as("file_name"),
        col("p.categories").as("categories"),
        col("p.word_count").as("word_count"),
        Html.lastmodToDate(col("p.lastmodText")).as("last_edited_date"))

  /** The normalized relational model (categorizer.py:39-68):
    * pages(id, file_name, word_count, last_edited_date),
    * categories(id, name), page_categories(page_id, category_id).
    */
  final case class Model(
      pages: DataFrame, categories: DataFrame, pageCategories: DataFrame)

  /** Spark-native rendering of save_to_sql's three driver loops
    * (categorizer.py:150-188):
    *
    *  - insert-if-absent (the reference's SELECT-then-INSERT per row,
    *    enforced by UNIQUE constraints) → LEFT-ANTI join against the
    *    existing dimension (O-16/O-18);
    *  - MySQL AUTO_INCREMENT ids → dense row numbers over the natural
    *    key via [[graft.ops.DenseIds]] (range-split counts → broadcast
    *    offsets → per-range row_number), offset by the existing max id,
    *    so re-running is idempotent AND deterministic (unlike
    *    monotonically_increasing_id) — and a fresh load of 100 TB of
    *    new keys never funnels through one global-sort task (the
    *    `Window.orderBy(key)` form this replaced did; DenseIdsSpec
    *    pins id-equality of the two forms);
    *  - the M2M wiring loop → explode (O-25) + two equi-joins on the
    *    natural keys (O-17); dims are small → broadcast-eligible.
    *
    * `existing` carries prior-run dimensions (empty frames for a fresh
    * load, like the reference's create-on-demand, categorizer.py:71-73).
    */
  def normalize(processed: DataFrame, existing: Option[Model] = None): Model = {
    val newPagesRaw = processed
      .select(col("file_name"), col("word_count"), col("last_edited_date"))
      .dropDuplicates("file_name")
    val newCatsRaw = processed
      .select(explode(col("categories")).as("name"))
      .distinct()

    val (pageBase, catBase) = existing match {
      case Some(m) => (Some(m.pages), Some(m.categories))
      case None    => (None, None)
    }

    val freshPages = pageBase.fold(newPagesRaw)(ex =>
      newPagesRaw.join(ex.select("file_name"), Seq("file_name"), "left_anti"))
    val freshCats = catBase.fold(newCatsRaw)(ex =>
      newCatsRaw.join(ex.select("name"), Seq("name"), "left_anti"))

    // Both dimensions' max ids in ONE driver action (a cross join of two
    // single-row aggs), not one .first() per table.
    val (pageOffset, catOffset) = (pageBase, catBase) match {
      case (Some(p), Some(c)) =>
        val r = p.agg(coalesce(max(col("id")), lit(0L)).as("mp"))
          .crossJoin(c.agg(coalesce(max(col("id")), lit(0L)).as("mc")))
          .first()
        (r.getLong(0), r.getLong(1))
      case _ => (0L, 0L)
    }

    val pagesNew = graft.ops.DenseIds
      .assign(freshPages, "file_name", offset = pageOffset)
      .select("id", "file_name", "word_count", "last_edited_date")
    val catsNew = graft.ops.DenseIds
      .assign(freshCats, "name", offset = catOffset)
      .select("id", "name")

    val pages = pageBase.fold(pagesNew)(_.unionByName(pagesNew))
    val categories = catBase.fold(catsNew)(_.unionByName(catsNew))

    val pairs = processed
      .select(col("file_name"), explode(col("categories")).as("name"))
      .distinct()
    val bridge = pairs
      .join(pages.select(col("id").as("page_id"), col("file_name")), "file_name")
      .join(categories.select(col("id").as("category_id"), col("name")), "name")
      .select("page_id", "category_id")

    Model(pages, categories, bridge)
  }

  /** One-call flagship pipeline: scan → extract → normalize. */
  def run(spark: SparkSession, dir: String): Model =
    normalize(processHtmlFiles(spark, dir))

  /** The analytical query the whole schema exists to serve
    * (README.md:23, "Category Distribution" in Superset):
    * pages-per-category, ranked.
    */
  def categoryDistribution(m: Model): DataFrame =
    m.pageCategories
      .join(m.categories.select(col("id").as("category_id"), col("name")),
        "category_id")
      .groupBy(col("name"))
      .agg(count(lit(1)).as("n_pages"))
      .orderBy(col("n_pages").desc, col("name"))

  /** O-27: the JDBC load the reference configured but never used
    * (categorizer.py:82-87 sketches exactly this URL/props shape and
    * save_to_sql falls back to the ORM loop instead). One
    * `df.write.jdbc` per table, pages/categories before the bridge for
    * FK ordering. Bulk-append form — for the reference's
    * insert-if-absent semantics against a live database use
    * [[syncToJdbc]]. JdbcSinkSpec exercises both against embedded
    * Derby (write → read-back → re-run idempotence), plus the
    * driver-resolution failure path for an unreachable server.
    */
  def saveToJdbc(m: Model, url: String, props: java.util.Properties): Unit = {
    // Explicit VARCHAR for the natural keys (matching the reference's
    // String(255) columns, categorizer.py:44-58): without it several
    // dialects (Derby included) create text as CLOB/TEXT, which breaks
    // pushed-down equality predicates and indexing on the key.
    m.pages.write.mode("append")
      .option("createTableColumnTypes", "file_name VARCHAR(255)")
      .jdbc(url, "pages", props)
    m.categories.write.mode("append")
      .option("createTableColumnTypes", "name VARCHAR(255)")
      .jdbc(url, "categories", props)
    m.pageCategories.write.mode("append").jdbc(url, "page_categories", props)
  }

  /** True iff the exception chain bottoms out in "table does not
    * exist" (Derby 42X05, MySQL 42S02, Postgres 42P01) — the ONE
    * failure that legitimately means "fresh database". Anything else
    * (connection refused, auth, timeout) must propagate: mapping it to
    * None would make [[syncToJdbc]] treat a POPULATED database as
    * empty and append duplicate rows with re-minted colliding ids.
    */
  private def tableMissing(e: Throwable): Boolean = {
    var c: Throwable = e
    while (c != null) {
      c match {
        case s: java.sql.SQLException
            if Set("42X05", "42S02", "42P01").contains(s.getSQLState) =>
          return true
        case _ =>
      }
      c = if (c.getCause eq c) null else c.getCause
    }
    false
  }

  /** Read a prior run's dimensions back from the database; None on a
    * fresh database (create-on-demand, categorizer.py:71-73). The
    * schema fetch is eager, so table absence surfaces here, not at
    * first action. Only "fresh" is forgiven: a transient load error
    * rethrows (see [[tableMissing]]), and a PARTIALLY initialized
    * store (a prior run crashed between the three table writes) fails
    * fast rather than silently re-minting ids against half the state.
    */
  def loadFromJdbc(spark: SparkSession, url: String,
      props: java.util.Properties): Option[Model] = {
    def read(t: String): Option[DataFrame] =
      try {
        val df = spark.read.jdbc(url, t, props)
        df.schema
        Some(df)
      } catch {
        case scala.util.control.NonFatal(e) if tableMissing(e) => None
      }
    (read("pages"), read("categories"), read("page_categories")) match {
      case (Some(p), Some(c), Some(pc)) => Some(Model(p, c, pc))
      case (None, None, None)           => None
      case (p, c, pc) =>
        val present = Seq("pages" -> p, "categories" -> c,
          "page_categories" -> pc).collect { case (n, Some(_)) => n }
        throw new IllegalStateException(
          s"JDBC store at $url is partially initialized (present: " +
            s"${present.mkString(", ")}) — repair or drop before syncing")
    }
  }

  /** The reference's full save_to_sql contract against a LIVE database
    * (categorizer.py:150-188): its per-row SELECT-then-INSERT under
    * UNIQUE constraints is exactly insert-if-absent — here: load the
    * existing dimensions, normalize against them (anti-join dedup +
    * max-id-offset surrogate keys), and append ONLY the delta rows, so
    * re-running on the same input writes nothing (idempotent) and new
    * input continues ids from the database's max (AUTO_INCREMENT
    * semantics). Set-based: three delta anti-joins instead of the
    * reference's per-row round-trips — the driver bottleneck SURVEY.md
    * §3.1 calls out.
    */
  def syncToJdbc(spark: SparkSession, processed: DataFrame, url: String,
      props: java.util.Properties): Model = {
    val existing = loadFromJdbc(spark, url, props)
    val m0 = normalize(processed, existing)
    // Pin the model AND the delta to the PRE-WRITE database snapshot.
    // Every `existing` frame reads the live tables lazily, and
    // saveToJdbc appends to those same tables in FK order — left lazy,
    // the bridge's dimension reads during the (later) page_categories
    // write would see the pages/categories rows appended moments
    // earlier, union them in twice, and append duplicated bridge rows.
    // Dimension-sized frames, so two materialization rounds are cheap;
    // the returned model is likewise stable however late the caller
    // reads it.
    val m = Model(m0.pages.localCheckpoint(),
      m0.categories.localCheckpoint(), m0.pageCategories.localCheckpoint())
    val delta = existing match {
      case None => m
      case Some(ex) => Model(
        m.pages.join(ex.pages.select(col("file_name")),
          Seq("file_name"), "left_anti")
          .select("id", "file_name", "word_count", "last_edited_date")
          .localCheckpoint(),
        m.categories.join(ex.categories.select(col("name")),
          Seq("name"), "left_anti")
          .select("id", "name")
          .localCheckpoint(),
        m.pageCategories.join(ex.pageCategories,
          Seq("page_id", "category_id"), "left_anti")
          .localCheckpoint())
    }
    saveToJdbc(delta, url, props)
    m
  }
}
