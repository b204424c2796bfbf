package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/host-level corpus operators — the domain-granular half of a
  * web-scale curation pipeline (extension surface; the reference has
  * no web-corpus layer). A crawled corpus is dominated by a handful
  * of hot registered domains; every curation decision (dedup budget,
  * quality priors, mixing weights, per-domain caps) keys on the
  * registered domain, not the raw host, so the primitives are: pull
  * the host out of the URL, collapse it to its registered domain,
  * profile each domain (volume, token mass, within-domain duplicate
  * rate), and draw a deterministic per-domain-capped sample.
  *
  * All extraction is regexp over the url column — identical regex
  * semantics in Spark (Java) and DuckDB (RE2) for these patterns, so
  * every operator here is fully oracle-checkable.
  */
object WebOps {

  /** Fixture adapter: the synthetic documents table has a `source`
    * column but no URLs, so derive one deterministically per doc —
    * three rotating subdomains per source under a per-source
    * registered domain ("https://www.src3.example/en/123"). Purely
    * column-arithmetic (SQL-replayable); real corpora skip this and
    * feed their crawl url column straight to [[hostParts]]. */
  def syntheticUrls(documents: DataFrame): DataFrame =
    documents.withColumn("url", concat(
      lit("https://"),
      element_at(array(lit("www"), lit("cdn"), lit("blog")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")),
      lit("."), col("source"), lit(".example/"), col("lang"),
      lit("/"), col("doc_id")))

  /** Host and registered-domain extraction from a url column. The
    * registered domain here is the last two labels of the host — the
    * public-suffix-list refinement swaps one regexp, same plan. Rows
    * whose url yields no host are kept with empty host/domain (the
    * profile surfaces them instead of silently dropping). */
  def hostParts(docs: DataFrame): DataFrame =
    docs
      .withColumn("host", regexp_extract(col("url"), "^https?://([^/]+)", 1))
      .withColumn("domain", regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1))

  /** Per-registered-domain corpus profile: doc and distinct-host
    * counts, token mass, within-domain exact-duplicate mass (docs
    * whose md5(text) occurs more than once INSIDE the domain — the
    * boilerplate/mirror signal that drives per-domain dedup budgets)
    * and its rate.
    *
    * Scale: one tokenize pass; the duplicate tally aggregates on
    * (domain, fingerprint) first — map-side partial combine absorbs
    * the template-page skew — then rolls up to the domain; the
    * distinct-host count rides the same domain shuffle. Domain
    * cardinality is registry-bounded (~1e8 worst case), never
    * corpus-sized. */
  def domainProfile(documents: DataFrame): DataFrame = {
    val base = hostParts(syntheticUrlsIfMissing(documents))
      .select(col("doc_id"), col("host"), col("domain"),
        md5(col("text")).as("fp"),
        size(expr(s"regexp_extract_all(lower(text), '${TextOps.tokenRe}', 0)"))
          .cast("long").as("ntok"))
    val perFp = base.groupBy(col("domain"), col("fp"))
      .agg(count(lit(1)).cast("long").as("c"),
           sum(col("ntok")).cast("long").as("t"))
    val rolled = perFp.groupBy(col("domain"))
      .agg(sum(col("c")).cast("long").as("n_docs"),
           sum(col("t")).cast("long").as("n_tokens"),
           coalesce(sum(when(col("c") > 1, col("c"))), lit(0L))
             .cast("long").as("n_dup_docs"))
    val hosts = base.groupBy(col("domain"))
      .agg(countDistinct(col("host")).cast("long").as("n_hosts"))
    rolled.join(hosts, Seq("domain"))
      .withColumn("dup_rate", (
        col("n_dup_docs").cast("double") / col("n_docs")))
      .select(col("domain"), col("n_docs"), col("n_hosts"),
        col("n_tokens"), col("n_dup_docs"), col("dup_rate"))
      .orderBy(col("domain"))
  }

  /** Deterministic domain-capped sample: at most k docs per
    * registered domain, chosen by smallest xxhash64(doc_id) — the
    * hot-domain flattener (a crawl where one domain is 90% of the
    * corpus must not be 90% of the training mix). Same contract as
    * the exactly-k stratified draw (q142): reproducible across
    * engines, uniform within a domain, and rank-bounded so Spark 4's
    * WindowGroupLimit caps per-task state at k rows per domain
    * rather than sorting whole domains. */
  def domainCappedSample(documents: DataFrame, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("sample_key"), col("doc_id"))
    hostParts(syntheticUrlsIfMissing(documents))
      .select(col("doc_id"), col("host"), col("domain"),
        xxhash64(col("doc_id")).as("sample_key"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("domain"), col("rk"), col("doc_id"), col("host"), col("sample_key"))
      .orderBy(col("domain"), col("rk"))
  }

  /** Domain-aware token-budget mix plan — the q134 sqrt-weighted
    * per-source plan keyed on the registered domain, plus the HARD
    * per-domain share cap sqrt-weighting alone doesn't give you: no
    * domain may exceed `maxSharePct` of the total budget, however
    * large its crawl footprint (the hot-domain guard at the
    * token-budget level, complementing [[domainCappedSample]]'s
    * doc-count cap). Integer-exact targets (DECIMAL division), one
    * tokenize pass, domain-keyed aggregate — registry-bounded
    * cardinality, never corpus-sized. */
  def domainTokenBudget(documents: DataFrame, totalBudget: Long = 200000L,
                        maxSharePct: Int = 20): DataFrame = {
    val per = hostParts(syntheticUrlsIfMissing(documents))
      .select(col("domain"),
        size(expr(s"regexp_extract_all(text, '${TextOps.tokenRe}', 0)"))
          .cast("long").as("n_toks"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .withColumn("w_sqrt", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
      .localCheckpoint(false)
    val tot = per.agg(sum(col("w_sqrt")).as("tot_w"))
    val cap = totalBudget * maxSharePct / 100
    per.crossJoin(broadcast(tot))
      .withColumn("target_tokens", expr(
        s"CAST((CAST(w_sqrt AS DECIMAL(38,0)) * CAST($totalBudget AS DECIMAL(38,0))) " +
        "div CAST(tot_w AS DECIMAL(38,0)) AS BIGINT)"))
      .withColumn("capped_tokens", least(col("target_tokens"), lit(cap)))
      .withColumn("sample_rate", (
        least(lit(1.0), col("capped_tokens").cast("double") / col("n_tokens"))))
      .select(col("domain"), col("n_docs"), col("n_tokens"), col("w_sqrt"),
        col("target_tokens"), col("capped_tokens"), col("sample_rate"))
      .orderBy(col("domain"))
  }

  /** Fixture adapter for the canonicalization family: a messy crawl
    * frontier where each CONTENT page (doc_id div 2) was reached by
    * two differently-mangled URLs — upper-cased scheme+host, a
    * utm tracking param, a fragment, or a trailing slash
    * (doc_id mod 4 picks the mangle). Canonicalization must collapse
    * each pair back to one URL. */
  def syntheticCrawlUrls(documents: DataFrame): DataFrame = {
    // every URL component derives from doc_id div 2 (the content-page
    // id), so the two docs of a pair differ ONLY in the mangle — the
    // collapse is what canonicalization must recover
    val page = expr("doc_id div 2")
    val site = pmod(page, lit(20))
    val base = concat(lit("https://www.src"), site, lit(".example/page/"), page)
    documents.withColumn("url",
      when(pmod(col("doc_id"), lit(4)) === 0,
        concat(lit("HTTPS://WWW.SRC"), site, lit(".EXAMPLE/page/"), page))
      .when(pmod(col("doc_id"), lit(4)) === 1, concat(base, lit("?utm_source=feed")))
      .when(pmod(col("doc_id"), lit(4)) === 2, concat(base, lit("#section-2")))
      .otherwise(concat(base, lit("/"))))
  }

  /** URL canonicalization — the dedup key normalizer every crawl
    * pipeline runs before URL-level dedup: drop the fragment, strip
    * utm_* tracking params (cleaning up the separator they leave),
    * lowercase the scheme+host (path stays case-sensitive), and trim
    * a trailing slash off non-root paths. Every step is a
    * backreference-free regexp or substring — identical semantics in
    * Java regex and RE2, so the whole chain oracle-replays. Pure
    * per-row projection, no shuffle. */
  def urlCanonicalize(docs: DataFrame): DataFrame = {
    val noFrag = regexp_replace(col("url"), "#.*$", "")
    val noUtmMid = regexp_replace(noFrag, "utm_[A-Za-z]+=[^&#]*&", "")
    val noUtm = regexp_replace(noUtmMid, "[?&]utm_[A-Za-z]+=[^&#]*", "")
    docs
      .withColumn("c1", noUtm)
      .withColumn("sh", regexp_extract(col("c1"), "^([A-Za-z]+://[^/]*)", 1))
      .withColumn("c2", concat(lower(col("sh")),
        expr("substring(c1, length(sh) + 1)")))
      .withColumn("canon_url",
        when(col("c2").rlike("://[^/]+/.+/$"),
          expr("substring(c2, 1, length(c2) - 1)"))
        .otherwise(col("c2")))
      .drop("c1", "sh", "c2")
  }

  /** URL-level dup groups after canonicalization: each canonical URL
    * with the raw-variant spread it absorbed and the keeper doc
    * (min doc_id) — the election URL-dedup feeds to the fetch
    * scheduler (fetch once, not once per mangled alias). One shuffle
    * on the canonical key. */
  def canonicalDupGroups(documents: DataFrame): DataFrame =
    urlCanonicalize(syntheticCrawlUrls(documents))
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).cast("long").as("n_urls"),
           countDistinct(col("url")).cast("long").as("n_raw_urls"),
           min(col("doc_id")).as("keeper"))
      .orderBy(col("canon_url"))

  /** Train/test leakage through URL mirrors — the split-integrity
    * hole q122's content-gram matrix can miss when mirrors differ in
    * boilerplate: two docs that canonicalize to the SAME URL are the
    * same page, and if the q94 hash split (which keys on doc_id, not
    * content) lands them in different splits, the test set contains
    * training pages. Composes the q154 canonical election with the
    * exact q94 split assignment; emits only the leaking groups (the
    * fix list: move every member to the keeper's split, or drop).
    * One canonical-key shuffle + a doc-keyed join — both sides are
    * id+key columns, text never moves. */
  def urlSplitLeakage(documents: DataFrame): DataFrame = {
    val groups = urlCanonicalize(syntheticCrawlUrls(documents))
      .select(col("doc_id"), col("canon_url"))
    val splits = documents
      .select(col("doc_id"), pmod(xxhash64(col("doc_id")), lit(10)).as("bucket"))
      .withColumn("split", when(col("bucket") < 8, "train")
        .when(col("bucket") === 8, "val").otherwise("test"))
      .select(col("doc_id"), col("split"))
    groups.join(splits, "doc_id")
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
           countDistinct(col("split")).cast("long").as("n_splits"),
           min(col("split")).as("split_lo"), max(col("split")).as("split_hi"))
      .filter(col("n_splits") >= 2)
      .orderBy(col("canon_url"))
  }

  private def syntheticUrlsIfMissing(documents: DataFrame): DataFrame =
    if (documents.columns.contains("url")) documents else syntheticUrls(documents)
}
