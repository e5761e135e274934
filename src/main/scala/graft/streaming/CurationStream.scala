package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** In-flight corpus curation: quality-classifier scoring at ingest.
  *
  * The hashed linear classifier is STATELESS per document (a
  * broadcast-literal weight vector dotted with the document's hashed
  * bag of words — see [[graft.functions.Text.hashedLinearDot]]), so
  * the streaming twin is the batch projection applied to a streaming
  * DataFrame: no state store, no watermark, no output-mode caveats —
  * every micro-batch scores independently, and stream output is
  * BIT-EQUAL to the batch query over the same rows by construction
  * (the spec still proves it end-to-end through a MemoryStream).
  *
  * At ingest scale this is the filter that decides keep/drop BEFORE
  * a document is ever written to the lake — the cheapest place to
  * spend a quality model.
  */
object CurationStream {

  /** Score each document with the hashed linear classifier: emits
    * (idCol, n_tokens, logit, kept). Works identically on a static or
    * a streaming DataFrame — that sameness IS the batch/stream
    * equivalence.
    */
  def scored(docs: DataFrame, idCol: String, textCol: String,
             weights: Seq[(String, String)]): DataFrame = {
    val tok = Text.tokens(col(textCol))
    val dot = Text.hashedLinearDot(tok, weights)
    docs.select(col(idCol),
      size(tok).cast("long").as("n_tokens"),
      round(dot.cast("double") / size(tok).cast("double"), 4).as("logit"),
      (dot > 0).as("kept"))
  }

  /** PII census at ingest — the streaming twin of `t_pii_detect`:
    * the counting is pure map-side regexp + Luhn array algebra, so the
    * stream operator is the SAME projection with zero state; a
    * pipeline can route or quarantine PII-bearing documents before
    * admitting them. Bit-equal to batch by construction (spec-proven).
    */
  def piiScreen(docs: DataFrame, idCol: String,
                textCol: String): DataFrame = {
    val c = Text.piiCounts(col(textCol))
    docs.select(col(idCol),
      c.getField("n_emails").as("n_emails"),
      c.getField("n_phones").as("n_phones"),
      c.getField("n_ipv4").as("n_ipv4"),
      c.getField("n_cards").as("n_cards"),
      (c.getField("n_emails") + c.getField("n_phones") +
        c.getField("n_ipv4") + c.getField("n_cards") > 0).as("has_pii"))
  }

  /** Mojibake repair at ingest — the streaming twin of `t_mojibake`:
    * the native graft_fix_mojibake expression is a stateless per-row
    * repair, applied before anything downstream tokenizes broken text.
    */
  def mojibakeRepair(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val fixed = graft.expressions.TextExprs.fixMojibake(col(textCol))
    docs.select(col(idCol), fixed.as("clean"),
      (fixed =!= col(textCol)).as("repaired"))
  }

  /** Markup stripping at ingest — the streaming twin of
    * `t_html_extract`: the native graft_html_to_text walk is a
    * stateless per-row transform (tag strip, script/style drop,
    * entity decode, whitespace collapse), so raw crawl payloads
    * become clean text BEFORE any downstream screen tokenizes them —
    * the natural head of the ingest chain (html → mojibake → PII →
    * quality). Emits (idCol, clean, n_links) so a frontier consumer
    * can fan the outlinks without re-walking the markup.
    */
  def htmlScreen(docs: DataFrame, idCol: String,
                 textCol: String): DataFrame =
    docs.select(col(idCol),
      graft.expressions.HtmlExprs.htmlToText(col(textCol)).as("clean"),
      size(graft.expressions.HtmlExprs.htmlLinks(col(textCol)))
        .as("n_links"))

  /** Unicode sanitization at ingest — the streaming twin of
    * `t_sanitize`: the stateless regexp+translate chain applied before
    * anything downstream tokenizes (invisible characters split tokens
    * silently; typographic punctuation forks dedup shingles).
    */
  def sanitizeScreen(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val clean = Text.sanitize(col(textCol))
    docs.select(col(idCol), clean.as("clean"),
      (clean =!= col(textCol)).as("changed"))
  }

  /** Unicode script census at ingest — the streaming twin of
    * `t_script_census`: per-document script char counts + dominant
    * script, a routing/quarantine signal for multilingual crawls
    * (an unexpected script mix is itself a contamination flag).
    */
  def scriptScreen(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    def n(cls: String) = length(col(textCol)) -
      length(regexp_replace(col(textCol), s"[\\p{Is$cls}]", ""))
    val counts = Seq("latin" -> n("Latin"), "cyrillic" -> n("Cyrillic"),
      "han" -> n("Han"), "greek" -> n("Greek"))
    val best = greatest(counts.map(_._2): _*)
    val dominant = counts.foldRight(lit("none")) { case ((nm, c), acc) =>
      when(c === best && best > 0, lit(nm)).otherwise(acc)
    }
    docs.select(col(idCol), counts.head._2.as("n_latin"),
      counts(1)._2.as("n_cyrillic"), counts(2)._2.as("n_han"),
      counts(3)._2.as("n_greek"), dominant.as("dominant"))
  }

  /** The full curation decision chain at ingest — the streaming twin
    * of [[graft.Pipelines.pipelineC]]'s decision pass: markup strip →
    * mojibake repair → PII census → Gopher quality → keep, all
    * stateless column algebra, so the deployed keep/drop filter is
    * literally the batch projection applied to the stream (a sink can
    * route kept docs to the lake and dropped ones to quarantine).
    */
  def curateScreen(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    graft.Pipelines.curateDecisions(docs, idCol, textCol)

  /** The FULL curation chain (screens + dedup + policy) for streaming
    * ingest. The dedup and quota stages need a within-batch window (a
    * non-time window is illegal on an unbounded stream), so the
    * deployment shape is `foreachBatch(curateMicroBatch(_, ...))`:
    * each micro-batch runs the EXACT batch chain — bit-equal to the
    * batch run over the same rows by construction (StreamingSpec
    * proves it end-to-end through a MemoryStream). Semantics at the
    * batch boundary are the honest ones: `dup_exact` and the quota
    * rank see one micro-batch at a time, while `dup_near` sees ALL
    * history through the persisted band index — which is exactly why
    * the cross-batch dedup memory lives in the index artifact (the
    * daily `index append` keeps it current), not in stream state.
    */
  def curateMicroBatch(batch: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text", dedup: Boolean = false,
                       index: Option[graft.operators.Dedup.BandIndex] = None,
                       allowedLangs: Option[Seq[String]] = None,
                       classifier: Option[graft.operators.Logistic.Trained] = None,
                       quota: Option[(String, Int)] = None,
                       tokenQuota: Option[(String, Long)] = None,
                       tokenBudgets: Option[(String, org.apache.spark.sql.DataFrame)] = None): DataFrame =
    graft.Pipelines.curateChain(batch, idCol, textCol, dedup, index,
      allowedLangs, classifier, quota, tokenQuota, tokenBudgets)

  /** The daily-ops loop on a STREAM: the `foreachBatch` body that
    * curates each micro-batch with the exact batch chain
    * ([[curateMicroBatch]]) and appends its funnel report to the
    * persisted ledger under `run-<batchId>` — so a continuously-
    * ingesting deployment leaves the same run-keyed ops trail a daily
    * batch job does ([[graft.operators.CurationLedger.trend]] reads
    * both identically; StreamingSpec proves ledger rows == the batch
    * funnel per micro-batch). Returns the decision frame for the
    * caller's own sink routing.
    *
    * The run key is the batch id ZERO-PADDED to 12 digits: trend
    * orders runs lexicographically by run_id, and an unpadded
    * `run-10` would sort before `run-2`, silently computing every
    * delta against the wrong previous micro-batch.
    */
  def curateAndLedger(spark: org.apache.spark.sql.SparkSession,
                      ledgerPath: String,
                      batch: DataFrame, batchId: Long,
                      idCol: String = "doc_id",
                      textCol: String = "text", dedup: Boolean = false,
                      index: Option[graft.operators.Dedup.BandIndex] = None,
                      allowedLangs: Option[Seq[String]] = None,
                      classifier: Option[graft.operators.Logistic.Trained] = None,
                      quota: Option[(String, Int)] = None): DataFrame = {
    val decisions = curateMicroBatch(batch, idCol, textCol, dedup,
      index, allowedLangs, classifier, quota)
      .localCheckpoint(true) // decisions feed the funnel AND the caller
    graft.operators.CurationLedger.append(spark, ledgerPath,
      f"run-$batchId%012d", graft.Pipelines.curationReport(decisions))
    decisions
  }

  /** TRAINED-classifier screen at ingest — the deployment shape of the
    * persisted [[graft.operators.Logistic]] artifact: the weight map
    * (read back model-sized) rides as a plan literal, and each
    * arriving document gets its exact-decimal logit from ONE map-side
    * fold over its own tokens ([[graft.operators.Logistic.scoreInline]]
    * — stateless, no state store, no watermark). `kept` is the
    * artifact's OWN deployment clause ([[graft.operators.Logistic
    * .Trained.keeps]]: z reaches the stored PR-curve operating point,
    * or the legacy decimal sign when none was selected), the same
    * contract the batch curation chain's classifier stage applies —
    * so the streamed screen is bit-equal to batch over the same rows
    * by construction (StreamingSpec proves it end-to-end through a
    * MemoryStream).
    */
  def classifierScreen(docs: DataFrame,
                       model: graft.operators.Logistic.Trained,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    graft.operators.Logistic.scoreInline(docs, model.weights, idCol,
        textCol, 2, model.gram)
      .withColumn("kept", model.keepsZ(col("z")))

  /** Frontier screening at ingest — the streaming half of
    * `f_frontier`: typed outlinks (`graft_html_refs`, base-href
    * resolved) extracted and canonicalized STATELESSLY from each
    * arriving page, then flagged against a static known-URL frame via
    * a stream-static left join (append-legal — the crawl-state
    * analogue of pipeline B's existence join; the known set is the
    * persisted URL table the batch frontier maintains). Emits one row
    * per 'a'-candidate: (idCol, url, host, known) — a sink routes
    * unknown urls to the fetch queue as pages stream in, instead of
    * waiting for the nightly frontier job.
    */
  def frontierScreen(docs: DataFrame, known: DataFrame,
                     idCol: String = "doc_id",
                     htmlCol: String = "text"): DataFrame = {
    val refs = docs.select(col(idCol),
        explode(graft.expressions.HtmlExprs.htmlRefs(col(htmlCol)))
          .as("r"))
      .filter(col("r.kind") === "a")
      .select(col(idCol),
        graft.functions.Urls.canonicalizeUrl(col("r.url")).as("url"))
      .filter(col("url").isNotNull)
    refs.join(known.select(col("url")).withColumn("__k", lit(true)),
        Seq("url"), "left")
      .select(col(idCol), col("url"),
        regexp_extract(col("url"), "^[a-z]+://([^/]+)", 1).as("host"),
        coalesce(col("__k"), lit(false)).as("known"))
  }

  /** Pipeline D on a STREAM — the `foreachBatch` body that runs the
    * EXACT batch crawl wave ([[graft.Pipelines.crawlWave]]) over each
    * arriving micro-batch of candidate urls: canonicalize + resolve,
    * screen against the persisted frontier, robots-gate, schedule,
    * advance both crawl-state artifacts, ledger the funnel. The
    * screens are stream-static joins and the artifact appends are the
    * batch appends, so a candidate stream gets the same semantics a
    * nightly wave does, micro-batch by micro-batch — urls fetched in
    * batch N screen as `known` in batch N+1 through the artifact,
    * exactly like consecutive daily waves (StreamingSpec proves it
    * end-to-end through a MemoryStream). The wave key zero-pads the
    * batch id so the ledger trend's lexicographic run order matches
    * batch order. Returns the decision frame for the caller's own
    * sink routing.
    */
  def crawlWaveBatch(spark: org.apache.spark.sql.SparkSession,
                     batch: DataFrame, batchId: Long,
                     robotsTxt: DataFrame, frontierPath: String,
                     fetchLogPath: String,
                     fetchedAt: java.sql.Timestamp,
                     resolution: Option[DataFrame] = None,
                     ledgerPath: Option[String] = None,
                     urlCol: String = "url"): DataFrame =
    graft.Pipelines.crawlWave(spark, batch, robotsTxt, frontierPath,
      fetchLogPath, fetchedAt, f"wave-$batchId%012d",
      resolution, ledgerPath, urlCol)._1

  /** Recrawl classification at ingest — the streaming half of
    * `f_sitemap_recrawl`: declared sitemap entries (url, lastmod)
    * stream in (a sitemap-discovery feed), the persisted FETCH LOG
    * rides as the static side, and each entry gets its
    * new/stale/fresh/unknown verdict from the same
    * [[graft.sources.Sitemaps.recrawlPlan]] algebra — stream-static
    * left join on the canonical url key, append-legal, no state. A
    * scheduler consumes `stale` + `new` rows as change signals arrive
    * instead of waiting for the nightly recrawl sweep.
    *
    * One batch/stream divergence is inherent and documented:
    * recrawlPlan's batch form dedupes mirrors (latest lastmod per
    * canonical url) with a keyed agg, which an append stream cannot
    * do across micro-batches — so this screen classifies EVERY
    * arriving entry independently (a mirror re-declaring an url
    * yields another row; the consumer's seen-set dedupes). Over
    * mirror-free input the two are bit-equal (StreamingSpec).
    */
  def recrawlScreen(entries: DataFrame,
                    log: graft.operators.CrawlState.FetchLog,
                    urlCol: String = "url",
                    lastmodCol: String = "lastmod"): DataFrame = {
    val p = graft.sources.Sitemaps.lastmodParsed(col(lastmodCol))
    val canon = entries.select(
        graft.functions.Urls.canonicalizeUrl(col(urlCol)).as("url"),
        p.getField("ts").as("lastmod"),
        p.getField("has_time").as("lastmod_has_time"))
      .filter(col("url").isNotNull)
    canon.join(log.fetches
        .select(col("url"),
          col("fetched_at").cast("timestamp").as("fetched_at")),
        Seq("url"), "left")
      .select(col("url"),
        regexp_extract(col("url"), "^[a-z]+://([^/]+)", 1).as("host"),
        col("lastmod"), col("lastmod_has_time"), col("fetched_at"),
        graft.sources.Sitemaps.recrawlStatus(col("lastmod"),
          col("lastmod_has_time"), col("fetched_at")).as("status"))
  }

  /** Robots gate at fetch time — the streaming half of
    * `f_robots_gate`/`f_fetch_slots`: candidate URLs stream in, the
    * host-bounded PARSED rule table (host, rules, delay_s — built
    * once from the fetched robots.txt payloads, the
    * [[graft.functions.Robots.parseRules]] fold) rides as a broadcast
    * static side, and each url gets its longest-match verdict plus
    * the host's declared Crawl-delay, all map-side (stream-static
    * equi-join on the host key, append-legal, no state). A fetcher
    * consumes only `ok` rows and paces by `delay_s` — politeness
    * enforced in-flight instead of in the nightly schedule. A url
    * whose host has no rule row passes (no robots.txt ⇒ allowed, the
    * crawl default) with a null delay.
    */
  def robotsScreen(urls: DataFrame, rules: DataFrame,
                   urlCol: String = "url"): DataFrame = {
    val host = regexp_extract(col(urlCol), "^[a-z]+://([^/]+)", 1)
    urls.withColumn("host", host)
      .join(org.apache.spark.sql.functions.broadcast(rules),
        Seq("host"), "left")
      .select(col(urlCol).as("url"), col("host"),
        coalesce(graft.functions.Robots.isAllowed(col("rules"),
          graft.functions.Robots.urlPath(col(urlCol))), lit(true))
          .as("ok"),
        col("delay_s"))
  }

  /** Heading-aligned chunking at ingest — the streaming twin of
    * `t_section_chunks`: `graft_html_sections` cuts each arriving
    * page at its headings, and the ancestor path (latest h1/h2)
    * reconstructs INSIDE the row with one fold over the section
    * array — a document's sections all live in its own row, so the
    * path needs no window and the whole chunker is a stateless
    * projection (append-legal, no state store). Emits one row per
    * section: (idCol, sec, level, h1, h2, heading, body) — provably
    * equal to the batch window form (StreamingSpec: fold == window).
    */
  def sectionScreen(docs: DataFrame, idCol: String = "doc_id",
                    htmlCol: String = "text"): DataFrame = {
    val secs = graft.expressions.HtmlExprs.htmlSections(col(htmlCol))
    val outTy = "array<struct<sec:int,level:int,h1:string,h2:string," +
      "heading:string,body:string>>"
    val withPath = aggregate(secs,
      struct(array().cast(outTy).as("out"),
        lit(null).cast("string").as("h1"),
        lit(null).cast("string").as("h2")),
      (st, s) => {
        val h1 = when(s.getField("level") === 1, s.getField("heading"))
          .otherwise(st.getField("h1"))
        val h2 = when(s.getField("level") === 2, s.getField("heading"))
          .otherwise(st.getField("h2"))
        struct(
          array_append(st.getField("out"), struct(
            size(st.getField("out")).as("sec"),
            s.getField("level").as("level"), h1.as("h1"), h2.as("h2"),
            s.getField("heading").as("heading"),
            s.getField("body").as("body"))).as("out"),
          h1.as("h1"), h2.as("h2"))
      },
      st => st.getField("out"))
    docs.select(col(idCol), explode(withPath).as("s"))
      .select(col(idCol), col("s.sec").as("sec"),
        col("s.level").as("level"), col("s.h1").as("h1"),
        col("s.h2").as("h2"), col("s.heading").as("heading"),
        col("s.body").as("body"))
  }

  /** DSIR importance scoring at ingest: the offline-built λ table
    * (collected once via [[graft.operators.Dsir.lamLiteral]]) rides
    * as a plan literal, and each arriving document gets its log
    * importance weight statelessly — bit-equal to the batch
    * [[graft.operators.Dsir.scoreRelational]] over the same rows.
    */
  def dsirScored(docs: DataFrame,
                 lamMap: Map[String, java.math.BigDecimal],
                 defaultLam: java.math.BigDecimal,
                 idCol: String, textCol: String): DataFrame =
    graft.operators.Dsir.scoreInline(docs, lamMap, defaultLam,
      idCol, textCol)

  /** Running corpus digest over a document stream — the streaming twin
    * of `q_corpus_digest`. The digest is a commutative, associative
    * exact-DECIMAL sum of per-row md5 prefixes, so a streaming
    * aggregation in Complete mode maintains it incrementally with
    * O(1) state (one sum + one count), and after any prefix of the
    * stream the digest EQUALS the batch digest of the rows ingested so
    * far — the attestation two pipelines compare lands continuously
    * instead of in a nightly job. Same STRING emission as batch (a
    * digest is an opaque token; > 2^63 decimals must not meet a
    * comparator as numbers).
    */
  def digestStream(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame =
    docs
      .select(conv(substring(md5(concat(col(idCol).cast("string"),
          lit(":"), col(textCol))), 1, 15), 16, 10)
        .cast("decimal(20,0)").as("h"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("h")).cast("decimal(38,0)").cast("string").as("digest"))

  /** Live KMV distinct-count sketch per group (complete mode): the
    * SAME bounded [[graft.operators.Kmv.BottomKAgg]] the batch query
    * uses, applied to a streaming groupBy — the state store holds ≤ k
    * longs per group, and because the sketch is a total function of
    * the value SET (order- and batch-boundary-invariant), the stream's
    * final answer is bit-equal to the batch sketch over the same rows.
    * This is the "how many distinct documents have we ingested" counter
    * a 100 TB pipeline keeps without ever storing the distinct set.
    */
  def kmvStream(docs: DataFrame, groupCol: String, valueCol: String,
                k: Int): DataFrame = {
    val sk = graft.operators.Kmv.sketch(docs, col(groupCol), col(valueCol), k)
    sk.select(col("g"), size(col("kept")).cast("long").as("n_kept"),
      element_at(col("kept"), size(col("kept"))).as("kth_hash"),
      graft.operators.Kmv.estimate(col("kept"), k).as("est_distinct"))
  }
}
