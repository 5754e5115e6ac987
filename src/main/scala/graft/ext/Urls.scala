package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and host extraction — the curation stage every
  * web-crawl pretraining pipeline runs BEFORE any text operator
  * (RefinedWeb and CCNet both dedup and filter by URL first: two
  * fetches of the same page under `http://www.x.com/a//b/?utm_source=f`
  * and `https://x.com/a/b` must collapse to one key before text dedup
  * ever sees them).
  *
  * Rules (each pinned by an ExtSpec case):
  *   - fragment stripped (`#...` is client-side state);
  *   - scheme and host lowercased (RFC 3986 §6.2.2.1 — both are
  *     case-insensitive; the path is NOT touched);
  *   - leading `www.` stripped from the host;
  *   - the scheme's DEFAULT port stripped (`:80` for http, `:443` for
  *     https); non-default ports are identity-bearing and kept;
  *   - path: runs of slashes collapsed to one, trailing slash
  *     stripped (the root path renders as no path at all);
  *   - query: tracking parameters dropped (keys starting `utm_`, or in
  *     [[Urls.TrackingKeys]]), empties dropped, survivors SORTED by
  *     full `key=value` text and re-joined — parameter order is not
  *     identity-bearing, tracking decoration never is;
  *   - non-absolute or non-http(s) input → NULL (the caller's
  *     dead-letter lane).
  *
  * Everything is pure per-row narrow expressions — codegen'd
  * regexp/substring work plus one interpreted lambda pair (the
  * query-param filter; ~a handful of short array elements per row, so
  * the interpreted segment is bounded by param count, not text size) —
  * shuffle-free and replayable verbatim in the DuckDB oracle
  * ([[graft.OracleBuilders.urlCanonicalSql]]).
  *
  * Scale (100 TB): canonicalization is embarrassingly parallel; the
  * downstream URL-dedup/host-rollup aggregations key on
  * `url_canon`/`host`, which partial (map-side) aggregation keeps
  * shuffle-light — heavy-hitter hosts arrive pre-combined per
  * partition.
  */
object Urls {

  /** Query keys dropped outright (plus any key starting `utm_`). */
  val TrackingKeys: Seq[String] = Seq("gclid", "fbclid", "msclkid", "ref")

  private def parts(url: Column): (Column, Column, Column) = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val base = substring_index(noFrag, "?", 1)
    val rawQ = when(instr(noFrag, "?") > 0,
      noFrag.substr(instr(noFrag, "?") + 1, lit(1000000))).otherwise(lit(""))
    val scheme = lower(substring_index(base, "://", 1))
    val rest = base.substr(instr(base, "://") + 3, lit(1000000))
    (scheme, rest, rawQ)
  }

  private def hostOf(scheme: Column, rest: Column): Column = {
    val hostport = lower(substring_index(rest, "/", 1))
    val noWww = regexp_replace(hostport, "^www\\.", "")
    when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
  }

  private def valid(url: Column, scheme: Column): Column =
    instr(url, "://") > 0 && scheme.isin("http", "https")

  /** Canonical host of an absolute http(s) URL (lowercased, `www.`
    * and default port stripped); NULL for non-http(s) input. */
  def urlHost(url: Column): Column = {
    val (scheme, rest, _) = parts(url)
    when(valid(url, scheme), hostOf(scheme, rest)).otherwise(lit(null))
  }

  /** The full canonical form (see object doc for the rule table);
    * NULL for non-http(s) input. */
  def urlCanonical(url: Column): Column = {
    val (scheme, rest, rawQ) = parts(url)
    val hostport = substring_index(rest, "/", 1)
    val host = hostOf(scheme, rest)
    val path = rest.substr(length(hostport) + 1, lit(1000000))
    val pathNorm = regexp_replace(
      regexp_replace(path, "/{2,}", "/"), "/$", "")
    val kept = filter(split(rawQ, "&"), p => {
      val key = substring_index(p, "=", 1)
      p =!= "" && !startswith(key, lit("utm_")) &&
        !key.isin(TrackingKeys: _*)
    })
    val q = array_join(array_sort(kept), "&")
    when(valid(url, scheme),
      concat(scheme, lit("://"), host, pathNorm,
        when(length(q) > 0, concat(lit("?"), q)).otherwise(lit(""))))
      .otherwise(lit(null))
  }

  /** [[urlCanonical]] + [[urlHost]] as ONE typed per-row kernel — the
    * hot-path form for a whole-crawl canonicalization pass (the house
    * HOF-vs-kernel precedent: the expression form's query-param filter
    * is an interpreted lambda, and a kernel pays one compiled regex
    * set per partition instead of per-expression-tree). Returns
    * `(idCol, urlCol, url_canon, host)`; ExtSpec pins it value-equal
    * to the expression forms on the full fixture plus the edge table.
    * The expression form stays the oracle-replayable reference. */
  def urlCanonicalLocal(docs: org.apache.spark.sql.DataFrame,
      idCol: String, urlCol: String): org.apache.spark.sql.DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col(idCol).cast("long"), col(urlCol).cast("string"))
      .as[(java.lang.Long, String)]
      .map { case (id, u) =>
        val (c, h) = canonicalizeLocal(u)
        (id, u, c, h) }
      .toDF(idCol, urlCol, "url_canon", "host")
  }

  /** Scala twin of the expression rule table (shared by
    * [[urlCanonicalLocal]]); null-safe, (canonical, host). */
  private[graft] def canonicalizeLocal(u: String): (String, String) = {
    if (u == null) return (null, null)
    val noFrag = u.replaceAll("#.*$", "")
    val qPos = noFrag.indexOf('?')
    val base = if (qPos < 0) noFrag else noFrag.substring(0, qPos)
    val rawQ = if (qPos < 0) "" else noFrag.substring(qPos + 1)
    val sPos = base.indexOf("://")
    if (sPos < 0) return (null, null)
    val scheme = base.substring(0, sPos).toLowerCase
    if (scheme != "http" && scheme != "https") return (null, null)
    val rest = base.substring(sPos + 3)
    val slash = rest.indexOf('/')
    val hostport = (if (slash < 0) rest else rest.substring(0, slash))
      .toLowerCase
    val noWww = hostport.replaceFirst("^www\\.", "")
    val host =
      if (scheme == "http") noWww.replaceFirst(":80$", "")
      else noWww.replaceFirst(":443$", "")
    val path = if (slash < 0) "" else rest.substring(slash)
    val pathNorm = path.replaceAll("/{2,}", "/").replaceAll("/$", "")
    val kept = rawQ.split("&", -1).filter { p =>
      val key = { val e = p.indexOf('='); if (e < 0) p else p.substring(0, e) }
      p.nonEmpty && !key.startsWith("utm_") && !TrackingKeys.contains(key)
    }.sorted
    val q = if (kept.isEmpty) "" else kept.mkString("?", "&", "")
    (s"$scheme://$host$pathNorm$q", host)
  }

  /** Deterministic URL FIXTURE over the driver tables (`documents`
    * carries no URL column): every canonicalization rule appears —
    * mixed-case schemes, `www.` variants, default and non-default
    * ports, doubled slashes, trailing slashes, unsorted params,
    * `utm_*`/`gclid`/`ref` decoration, fragments — and distinct docs
    * collide onto the same canonical URL (the dedup case). Replayed
    * verbatim by the oracle ([[graft.OracleBuilders.demoUrlSql]]). */
  def demoUrl(docId: Column, source: Column): Column =
    concat(
      when(docId % 4 === 0, "http://")
        .when(docId % 4 === 1, "HTTP://www.")
        .when(docId % 4 === 2, "https://")
        .otherwise("HTTPS://WWW."),
      source, lit(".example.com"),
      when(docId % 5 === 0, ":80").when(docId % 5 === 1, ":443")
        .when(docId % 5 === 2, ":8080").otherwise(""),
      lit("/docs//"), (docId % 97).cast("string"),
      when(docId % 3 === 0, "/").otherwise(""),
      when(docId % 6 === 0, "?utm_source=feed&b=2&a=1")
        .when(docId % 6 === 1, "?b=2&utm_campaign=x&a=1&gclid=zz")
        .when(docId % 6 === 2, "?a=1&b=2")
        .when(docId % 6 === 3, "?ref=tw")
        .otherwise(""),
      when(docId % 7 === 0, "#frag").otherwise(""))
}
