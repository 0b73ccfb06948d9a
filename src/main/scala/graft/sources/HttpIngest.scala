package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** Scraper-shaped HTTP ingest source — reference S6-S9
  * (`/root/reference/glassdoor-scraper/src/main.py:144-193`,
  * `packages/common.py:16-42`, `packages/page.py:13-60`,
  * `packages/listing.py:188-205`) re-expressed Spark-first: the URL
  * frontier is a Dataset, fetching happens inside `mapPartitions` on
  * executors (I/O-bound row generator), retries stay inside the fetch
  * function, and the output is a typed Dataset ready for a partitioned
  * parquet sink.
  *
  * The HTTP client is behind [[Fetcher]] (this sandbox has no network;
  * tests inject canned HTML — FIXTURES.md A6), and parsing is regex-based
  * against the reference's selector semantics.
  *
  * Scale notes: one task per partition of the frontier; per-URL work never
  * touches the driver (the reference's per-page driver loop is gone);
  * dedup before the expensive fetch (`dropDuplicates` replaces the
  * reference's `@cache` memo, S10/D2).
  */
object HttpIngest {

  /** One (search-term, location) scrape assignment
    * (`main.py:32-38` config cross-product). */
  case class ScrapeTask(term: String, location: String, baseUrl: String)

  /** The scraper's 15-field row (`main.py:125-139`). */
  case class JobListing(
      company_name: Option[String],
      company_rating: Option[Double],
      company_offered_role: Option[String],
      company_role_location: Option[String],
      job_description: Option[String],
      requested_url: Option[String],
      compensation_and_benefits: Option[Double],
      culture_and_values: Option[Double],
      career_opportunities: Option[Double],
      work_life_balance: Option[Double],
      job_type: Option[String],
      industry: Option[String],
      job_function: Option[String],
      company_size: Option[String],
      estimated_salary: Option[String])

  /** One fetch attempt's outcome: the retry loop distinguishes failures
    * that retrying can fix from those it cannot. */
  sealed trait FetchResult extends Serializable
  object FetchResult {
    final case class Ok(body: String) extends FetchResult
    /** Permanent failure (4xx other than 429): retrying cannot help, so it
      * consumes exactly ONE attempt — a 404-heavy frontier must not stall
      * executor tasks for the full retry envelope per dead URL. */
    case object Permanent extends FetchResult
    /** Transient failure (429/5xx/timeout/connect error): retried inside
      * the reference's envelope. */
    case object Transient extends FetchResult
  }

  /** Pluggable page fetcher with the reference's retry envelope
    * (`common.py:37-42`: <= 10 retries, fixed backoff) — applied to
    * TRANSIENT failures only. Implementations must be Serializable — they
    * ship to executors. */
  trait Fetcher extends Serializable {
    def fetchOnce(url: String): FetchResult
    def maxRetries: Int = 10
    def backoffMs: Long = 0L
    final def fetch(url: String): Option[String] = {
      var i = 0
      while (i < maxRetries) {
        fetchOnce(url) match {
          case FetchResult.Ok(body)  => return Some(body)
          case FetchResult.Permanent => return None
          case FetchResult.Transient =>
            i += 1
            if (backoffMs > 0) Thread.sleep(backoffMs)
        }
      }
      None
    }
  }

  /** Canned-HTML fetcher for tests / offline runs; a missing page is a
    * canned 404 (permanent). */
  final class MapFetcher(pages: Map[String, String]) extends Fetcher {
    def fetchOnce(url: String): FetchResult =
      pages.get(url).fold[FetchResult](FetchResult.Permanent)(FetchResult.Ok)
  }

  /** Default live fetcher — completes S6 for networked deployments.
    * `java.net.http` client with the reference's retry envelope
    * (`common.py:16-42`: <= 10 attempts, 5 s sleep between retries, a
    * desktop User-Agent). The client itself is `@transient lazy` so the
    * fetcher serializes to executors and each JVM builds its own client.
    * This sandbox has no egress, so tests keep injecting [[MapFetcher]];
    * see IngestSpec's offline-skipped live smoke. */
  final class HttpFetcher(
      override val maxRetries: Int = 10,
      override val backoffMs: Long = 5000L,
      timeoutMs: Long = 30000L) extends Fetcher {
    @transient private lazy val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
      .build()
    def fetchOnce(url: String): FetchResult =
      try {
        val req = java.net.http.HttpRequest
          .newBuilder(java.net.URI.create(url))
          .timeout(java.time.Duration.ofMillis(timeoutMs))
          .header("User-Agent",
            "Mozilla/5.0 (Windows NT 10.0; Win64; x64) graft-ingest/1.0")
          .GET().build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        val code = resp.statusCode()
        if (code >= 200 && code < 300) FetchResult.Ok(resp.body())
        // 429 is rate limiting — the one 4xx where the envelope's fixed
        // backoff (common.py:37-42) is exactly the right response.
        else if (code >= 400 && code < 500 && code != 429)
          FetchResult.Permanent
        else FetchResult.Transient
      } catch {
        case scala.util.control.NonFatal(_) => FetchResult.Transient
      }
  }

  // ---- parsing (regex versions of the reference selectors) ---------------

  /** S8: result-page bounds — "N Jobs" and "Page 1 of M"
    * (`page.py:13-31`). */
  def parseBounds(html: String): (Int, Int) = {
    val jobs = "([0-9][0-9,]*)\\s+Jobs".r.findFirstMatchIn(html)
      .map(_.group(1).replace(",", "").toInt).getOrElse(0)
    val pages = "Page\\s+\\d+\\s+of\\s+(\\d+)".r.findFirstMatchIn(html)
      .map(_.group(1).toInt).getOrElse(1)
    (jobs, pages)
  }

  /** S7: listing links (`/partner/jobListing.htm?...` anchors,
    * `page.py:35-60`) plus the listing-page salary side-map
    * (`data-test="detailSalary"` spans, `page.py:45-47`).
    *
    * Salary pairing mirrors the reference's `a.parent.find(attrs=
    * {"data-test": "detailSalary"})` (`page.py:45`): the salary span lives
    * anywhere in the SAME listing card as the anchor — including BEFORE
    * it. When the page has card containers (`<li …>`, real result-page
    * markup), each anchor's region is its enclosing card — both
    * orderings pair correctly. On containerless markup card extents are
    * unknowable, so the fallback region is (this anchor, next anchor):
    * a preceding salary is ambiguous between two cards and claiming it
    * would steal the previous card's value. Either way a positional zip
    * is wrong: it misaligns every subsequent salary as soon as one card
    * lacks a salary or a duplicate href precedes a new one. */
  def parseListingLinks(html: String): Seq[(String, Option[String])] = {
    val hrefMatches =
      "href=\"([^\"]*/partner/jobListing\\.htm\\?[^\"]*)\""
        .r.findAllMatchIn(html).map(m => (m.start, m.group(1))).toVector
    val salaryMatches =
      "data-test=\"detailSalary\"[^>]*>([^<]+)<"
        .r.findAllMatchIn(html).map(m => (m.start, m.group(1).trim)).toVector
    val cardStarts = "<li[\\s>]".r.findAllMatchIn(html).map(_.start).toVector
    val anchorStarts = hrefMatches.map(_._1)
    val paired = hrefMatches.zipWithIndex.map { case ((pos, href), i) =>
      // Card region: [enclosing card open, next card open). Fallback
      // (no enclosing card): [this anchor, next anchor).
      val (lo, hi) = cardStarts.lastIndexWhere(_ <= pos) match {
        case -1 =>
          (pos, anchorStarts.lift(i + 1).getOrElse(Int.MaxValue))
        case c =>
          (cardStarts(c), cardStarts.lift(c + 1).getOrElse(Int.MaxValue))
      }
      val sal = salaryMatches.collectFirst {
        case (sp, sv) if sp > lo && sp < hi => sv
      }
      (href, sal)
    }
    paired.distinctBy(_._1) // S10/D2: first card wins for a repeated link
  }

  private def firstGroup(re: String, html: String): Option[String] =
    re.r.findFirstMatchIn(html).map(_.group(1).trim)
      .filter(s => s.nonEmpty && s != "N/A" && s != "Unknown")

  /** S9: one detail page → listing fields (`listing.py:14-186`): banner
    * employer/role/location, li-joined description with the <=10-char
    * full-text fallback (`listing.py:80-88`), highlight spans with
    * "N/A"/"Unknown" → null (`listing.py:100-113,180-181`). */
  def parseListing(url: String, html: String,
      salary: Option[String]): JobListing = {
    val name = firstGroup("data-test=\"employerName\"[^>]*>([^<]+)<", html)
    val rating = firstGroup("data-test=\"rating\"[^>]*>([^<]+)<", html)
      .flatMap(s => scala.util.Try(s.toDouble).toOption)
    val lis = "<li>([^<]+)</li>".r.findAllMatchIn(html)
      .map(_.group(1).trim).toSeq
    val joined = lis.mkString(" ")
    val desc =
      if (joined.length > 10) Some(joined)
      else firstGroup(
        "JobDescriptionContainer[^>]*>([\\s\\S]*?)</div>", html)
    def highlight(label: String): Option[String] =
      firstGroup(java.util.regex.Pattern.quote(label) +
        "</span>\\s*<span[^>]*>([^<]+)<", html)
    def ratingOf(label: String): Option[Double] =
      highlight(label).flatMap(s => scala.util.Try(s.toDouble).toOption)
    JobListing(
      company_name = name,
      company_rating = rating,
      company_offered_role =
        firstGroup("data-test=\"jobTitle\"[^>]*>([^<]+)<", html),
      company_role_location =
        firstGroup("data-test=\"location\"[^>]*>([^<]+)<", html),
      job_description = desc,
      requested_url = Some(url),
      compensation_and_benefits = ratingOf("Compensation & Benefits"),
      culture_and_values = ratingOf("Culture & Values"),
      career_opportunities = ratingOf("Career Opportunities"),
      work_life_balance = ratingOf("Work/Life Balance"),
      job_type = highlight("Job Type"),
      industry = highlight("Industry"),
      job_function = highlight("Job Function"),
      company_size = highlight("Size"),
      estimated_salary = salary)
  }

  /** P10: config cross-product — search_terms × locations expanded into
    * the URL frontier (`main.py:30-39`; config shape
    * `glassdoor-scraper/src/data/config.json:1-6`). Distributed form of
    * the reference's nested driver loops. */
  def frontier(spark: SparkSession, urlTemplate: String,
      terms: Seq[String], locations: Map[String, String]): Dataset[ScrapeTask] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    terms.toDF("term")
      .crossJoin(locations.toSeq.toDF("loc_name", "loc_code"))
      .select($"term", $"loc_name",
        format_string(urlTemplate, $"term", $"loc_code").as("baseUrl"))
      .as[(String, String, String)]
      .map { case (t, l, u) => ScrapeTask(t, l, u) }
  }

  /** Page-index URL rewrite (`main.py:49-58`): `.htm` → `_IP<n>.htm`. */
  def pageUrl(baseUrl: String, page: Int): String =
    if (page <= 1) baseUrl
    else baseUrl.replaceAll("\\.htm$", s"_IP$page.htm")

  /** The distributed scrape: frontier → mapPartitions(fetch result pages →
    * listing links → dedup → fetch details) → typed rows. */
  def scrape(spark: SparkSession, tasks: Seq[ScrapeTask], fetcher: Fetcher,
      maxPages: Int = 10): Dataset[JobListing] = {
    import spark.implicits._
    spark.createDataset(tasks)
      .repartition(math.max(tasks.size, 1))
      .mapPartitions { it =>
        it.flatMap { task =>
          fetcher.fetch(task.baseUrl).toSeq.flatMap { first =>
            val (_, nPages) = parseBounds(first)
            val pages = (1 to math.min(nPages, maxPages)).flatMap { p =>
              if (p == 1) Some(first)
              else fetcher.fetch(pageUrl(task.baseUrl, p))
            }
            pages.flatMap(parseListingLinks).distinct // S10/D2 dedup
              .flatMap { case (href, sal) =>
                fetcher.fetch(href).map(parseListing(href, _, sal))
              }
          }
        }
      }
  }

  /** S11-S13 sink: partitioned parquet by (term, location, ingest date). */
  def writePartitioned(listings: Dataset[JobListing], term: String,
      location: String, date: String, outDir: String): Unit =
    listings.toDF()
      .withColumn("search_term", org.apache.spark.sql.functions.lit(term))
      .withColumn("location", org.apache.spark.sql.functions.lit(location))
      .withColumn("ingest_date", org.apache.spark.sql.functions.lit(date))
      .write.mode("append")
      .partitionBy("search_term", "location", "ingest_date")
      .parquet(outDir)
}
