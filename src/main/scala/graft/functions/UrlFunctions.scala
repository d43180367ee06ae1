package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-dedup hygiene pass: the same page
  * arrives as `HTTPS://WWW.Site.com/p/?utm_source=feed#frag` and
  * `https://site.com/p?utm_campaign=x`, and exact/near dedup must see
  * ONE key. Every step is a codegen'd regexp over the column (no UDF,
  * no parsing library), mirrored verbatim by the SQL oracle.
  *
  * Canonical form (documented contract, applied in this order):
  *   1. fragment dropped;
  *   2. scheme + authority lowercased (path/query case preserved —
  *      paths are case-sensitive by RFC);
  *   3. leading `www.` stripped;
  *   4. tracking parameters (`utm_*`, `ref`) removed, separators
  *      repaired (`?utm=x&id=2` → `?id=2`, a tracking-only query
  *      disappears entirely);
  *   5. `/?` collapsed to `?` (trailing-slash-before-query variant).
  *
  * Parameter ORDER is preserved (sorting params canonically is a
  * different, lossier contract — callers who want it sort upstream).
  */
object UrlFunctions {

  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val prefix = lower(regexp_extract(noFrag, "^([^:/?#]+://[^/?#]*)", 1))
    val rest = regexp_replace(noFrag, "^[^:/?#]+://[^/?#]*", "")
    val lowered = concat(prefix, rest)
    val noWww = regexp_replace(lowered, "^(https?://)www\\.", "$1")
    val midParams = regexp_replace(noWww, "&(utm_[a-z]+|ref)=[^&]*", "")
    val leadParam =
      regexp_replace(midParams, "\\?(utm_[a-z]+|ref)=[^&]*&", "?")
    val onlyParam =
      regexp_replace(leadParam, "\\?(utm_[a-z]+|ref)=[^&]*$", "")
    regexp_replace(onlyParam, "/\\?", "?")
  }
}
