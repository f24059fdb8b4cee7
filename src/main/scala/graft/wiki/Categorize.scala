package graft.wiki

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    *  - MySQL AUTO_INCREMENT ids → `row_number()` over the natural key,
    *    offset by the existing max id, so re-running is idempotent AND
    *    deterministic (unlike monotonically_increasing_id). The global
    *    window is a single-partition sort of the NEW keys only — new
    *    dimension deltas are small; at 100 TB-of-new-keys swap to a
    *    two-pass zipWithIndex-style assignment, same contract;
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

    val (pageBase, catBase, maxPageId, maxCatId) = existing match {
      case Some(m) =>
        (Some(m.pages), Some(m.categories),
          coalesce(max(col("id")), lit(0L)),
          coalesce(max(col("id")), lit(0L)))
      case None => (None, None, lit(0L), lit(0L))
    }

    val freshPages = pageBase.fold(newPagesRaw)(ex =>
      newPagesRaw.join(ex.select("file_name"), Seq("file_name"), "left_anti"))
    val freshCats = catBase.fold(newCatsRaw)(ex =>
      newCatsRaw.join(ex.select("name"), Seq("name"), "left_anti"))

    val pageOffset = pageBase.fold(lit(0L))(ex =>
      lit(ex.agg(maxPageId.as("m")).first().getLong(0)))
    val catOffset = catBase.fold(lit(0L))(ex =>
      lit(ex.agg(maxCatId.as("m")).first().getLong(0)))

    val wPage = Window.orderBy(col("file_name"))
    val wCat = Window.orderBy(col("name"))
    val pagesNew = freshPages
      .withColumn("id", (row_number().over(wPage).cast("long") + pageOffset))
      .select("id", "file_name", "word_count", "last_edited_date")
    val catsNew = freshCats
      .withColumn("id", (row_number().over(wCat).cast("long") + catOffset))
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
    * FK ordering. The sandbox ships no JDBC driver or server, so this
    * path is exercised by a plan-construction test only (see
    * JdbcSinkSpec and README).
    */
  def saveToJdbc(m: Model, url: String, props: java.util.Properties): Unit = {
    m.pages.write.mode("append").jdbc(url, "pages", props)
    m.categories.write.mode("append").jdbc(url, "categories", props)
    m.pageCategories.write.mode("append").jdbc(url, "page_categories", props)
  }
}
