package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** robots.txt parsing and frontier gating — the politeness layer a
  * crawl frontier consults before fetching anything ([[Urls]] owns
  * canonicalization, `graft_html_refs` the extraction; this closes the
  * loop). Everything is column algebra (one `aggregate` fold over the
  * file's lines per host, then per-URL longest-match), so the gate
  * runs map-side after one broadcast-sized join of the per-host rule
  * table — robots files are host-bounded, never corpus-bounded.
  *
  * Dialect (fixed so oracles can state closed forms, and matching the
  * de-facto Google parser where it matters):
  *   - directives are case-insensitive, surrounding whitespace
  *     ignored; `#` starts a comment line; unknown lines are ignored;
  *   - consecutive `User-agent:` lines share one group; the first
  *     rule line (`Allow:`/`Disallow:`/`Crawl-delay:`) closes the
  *     group's agent list, and a later `User-agent:` starts a NEW
  *     group — [[parseRules]] and [[crawlDelay]] fold the SAME group
  *     segmentation, so a file's rules and its delay always attribute
  *     to the same agent sets;
  *   - rules seen before any `User-agent:` line belong to no group and
  *     are dropped;
  *   - only `*` groups and groups naming `agent` apply; if ANY group
  *     names `agent`, the agent-specific rules replace the `*` rules
  *     (the standard most-specific-group rule);
  *   - an empty rule value (`Disallow:` with nothing after it) matches
  *     nothing (the classic allow-all idiom);
  *   - per URL path, the longest matching prefix wins; on equal
  *     length, Allow beats Disallow; no matching rule means allowed.
  */
object Robots {

  /** Parse a robots.txt payload into the rule array that applies to
    * `agent`: array<struct<allow boolean, prefix string>>. One fold
    * over the lines with a (collecting, curStar, curAgent, sawAgent,
    * star, own) accumulator — map-side, no shuffle.
    */
  def parseRules(robots: Column, agent: String = "graft"): Column = {
    val zero = struct(
      lit(false).as("collecting"), lit(false).as("curStar"),
      lit(false).as("curAgent"), lit(false).as("sawAgent"),
      array().cast("array<struct<allow:boolean,prefix:string>>").as("star"),
      array().cast("array<struct<allow:boolean,prefix:string>>").as("own"))
    val folded = aggregate(split(robots, "\n"), zero, (st, line0) => {
      val line = trim(line0)
      val low = lower(line)
      val isUa = low.startsWith("user-agent:")
      val isAllow = low.startsWith("allow:")
      val isDis = low.startsWith("disallow:")
      val isDelay = low.startsWith("crawl-delay:")
      val value = trim(substr(line, instr(line, ":") + 1, length(line)))
      val ua = lower(value)
      // User-agent: extend the open group or start a new one
      val afterUa = struct(
        lit(true).as("collecting"),
        (when(st.getField("collecting"), st.getField("curStar"))
          .otherwise(lit(false)) || (ua === "*")).as("curStar"),
        (when(st.getField("collecting"), st.getField("curAgent"))
          .otherwise(lit(false)) || (ua === agent)).as("curAgent"),
        (st.getField("sawAgent") || (ua === agent)).as("sawAgent"),
        st.getField("star").as("star"), st.getField("own").as("own"))
      // Allow/Disallow: close the agent list, append where it applies
      // (an empty value matches nothing → no-op rule, dropped)
      val rule = struct(isAllow.as("allow"), value.as("prefix"))
      val afterRule = struct(
        lit(false).as("collecting"),
        st.getField("curStar").as("curStar"),
        st.getField("curAgent").as("curAgent"),
        st.getField("sawAgent").as("sawAgent"),
        when(st.getField("curStar") && value =!= "",
            array_append(st.getField("star"), rule))
          .otherwise(st.getField("star")).as("star"),
        when(st.getField("curAgent") && value =!= "",
            array_append(st.getField("own"), rule))
          .otherwise(st.getField("own")).as("own"))
      // Crawl-delay contributes no rule but closes the agent list —
      // the same segmentation crawlDelay's fold applies
      val afterDelay = struct(
        lit(false).as("collecting"),
        st.getField("curStar").as("curStar"),
        st.getField("curAgent").as("curAgent"),
        st.getField("sawAgent").as("sawAgent"),
        st.getField("star").as("star"), st.getField("own").as("own"))
      when(isUa, afterUa)
        .when(isAllow || isDis, afterRule)
        .when(isDelay, afterDelay)
        .otherwise(st) // comments, blanks, unknown directives
    })
    when(folded.getField("sawAgent"), folded.getField("own"))
      .otherwise(folded.getField("star"))
  }

  /** Crawl-delay (seconds) that applies to `agent`: the same group
    * semantics as [[parseRules]] (agent-specific group replaces `*`),
    * the LAST `Crawl-delay:` in the applicable groups wins, a
    * non-numeric value is ignored, absent ⇒ null (caller supplies the
    * fleet default). Like every rule line, a crawl-delay closes the
    * open agent list.
    */
  def crawlDelay(robots: Column, agent: String = "graft"): Column = {
    val zero = struct(
      lit(false).as("collecting"), lit(false).as("curStar"),
      lit(false).as("curAgent"), lit(false).as("sawAgent"),
      lit(null).cast("long").as("dStar"),
      lit(null).cast("long").as("dOwn"))
    val folded = aggregate(split(robots, "\n"), zero, (st, line0) => {
      val line = trim(line0)
      val low = lower(line)
      val isUa = low.startsWith("user-agent:")
      val isRule = low.startsWith("allow:") || low.startsWith("disallow:")
      val isDelay = low.startsWith("crawl-delay:")
      val value = trim(substr(line, instr(line, ":") + 1, length(line)))
      val ua = lower(value)
      // garbage delay value -> null (digits-only guard, then cast)
      val num = when(value.rlike("^[0-9]{1,9}$"), value.cast("long"))
      val afterUa = struct(
        lit(true).as("collecting"),
        (when(st.getField("collecting"), st.getField("curStar"))
          .otherwise(lit(false)) || (ua === "*")).as("curStar"),
        (when(st.getField("collecting"), st.getField("curAgent"))
          .otherwise(lit(false)) || (ua === agent)).as("curAgent"),
        (st.getField("sawAgent") || (ua === agent)).as("sawAgent"),
        st.getField("dStar").as("dStar"), st.getField("dOwn").as("dOwn"))
      val afterDirective = struct(
        lit(false).as("collecting"),
        st.getField("curStar").as("curStar"),
        st.getField("curAgent").as("curAgent"),
        st.getField("sawAgent").as("sawAgent"),
        when(isDelay && st.getField("curStar") && num.isNotNull, num)
          .otherwise(st.getField("dStar")).as("dStar"),
        when(isDelay && st.getField("curAgent") && num.isNotNull, num)
          .otherwise(st.getField("dOwn")).as("dOwn"))
      when(isUa, afterUa)
        .when(isRule || isDelay, afterDirective)
        .otherwise(st)
    })
    when(folded.getField("sawAgent"), folded.getField("dOwn"))
      .otherwise(folded.getField("dStar"))
  }

  /** `Sitemap:` URLs declared anywhere in the file — per the
    * robots.txt sitemap extension these are GROUP-INDEPENDENT (they
    * apply regardless of user-agent groups, so no fold is needed):
    * one filter+transform over the lines, preserving declaration
    * order. The value is taken after the FIRST ':' (the URL's own
    * scheme colon stays intact); empty values drop.
    */
  def sitemapUrls(robots: Column): Column =
    filter(
      transform(split(robots, "\n"), line0 => {
        val line = trim(line0)
        when(lower(line).startsWith("sitemap:"),
          trim(substr(line, instr(line, ":") + 1, length(line))))
          .otherwise(lit(""))
      }),
      v => v =!= "")

  /** Longest-match decision for a URL `path` under a parsed rule
    * array: the longest matching prefix wins, Allow beats Disallow on
    * ties (struct max over (len, allow)), no match ⇒ allowed.
    */
  def isAllowed(rules: Column, path: Column): Column = {
    val matches = filter(rules, r => path.startsWith(r.getField("prefix")))
    val winner = array_max(transform(matches, r =>
      struct(length(r.getField("prefix")).as("l"),
        r.getField("allow").as("allow"))))
    size(matches) === 0 || winner.getField("allow")
  }

  /** Path component of an absolute URL ('/' when empty). */
  def urlPath(url: Column): Column = {
    val p = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    when(p === "", lit("/")).otherwise(p)
  }
}
