package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Crawl URL canonicalization — the dedup key normalization every
  * web-scale ingest runs before url-keyed work (two crawls of
  * `HTTP://Example.COM:80/a?utm_source=x&id=1#top` and
  * `http://example.com/a?id=1` must collapse to one page key).
  *
  * Spec (deliberately small, exactly re-derivable in SQL):
  *  1. urls not matching `scheme://authority...` pass through verbatim;
  *  2. scheme and authority lowercase (the PATH stays case-sensitive);
  *  3. default ports stripped (`:80` for http, `:443` for https);
  *  4. the `#fragment` dropped;
  *  5. `utm_*=...` query parameters removed, separators re-collapsed
  *     (`&&`→`&`, `?&`→`?`, trailing `?`/`&` stripped).
  *
  * Pure column expressions over the RE2-compatible regex subset, so
  * the DuckDB oracle runs the IDENTICAL patterns (replacement
  * backreference syntax differs — `$1` here, `\\1` there — which is
  * why the spec avoids backreferences entirely). */
object Urls {

  def canonicalizeUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val rest = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val authNoPort =
      when(scheme === "http", regexp_replace(auth, ":80$", ""))
        .when(scheme === "https", regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    val r1 = regexp_replace(rest, "utm_[A-Za-z_]*=[^&]*", "")
    val r2 = regexp_replace(r1, "&&+", "&")
    val r3 = regexp_replace(r2, "\\?&", "?")
    val r4 = regexp_replace(r3, "[?&]$", "")
    when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), authNoPort, r4))
  }
}
