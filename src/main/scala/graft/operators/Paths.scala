package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** O10/O11/O12 — path-rewrite projections (SURVEY.md §2.2), as pure
  * Column expressions so they stay inside whole-stage codegen and can be
  * pushed around by Catalyst. No UDFs.
  */
object Paths {

  private def rstripSlash(s: String): String = s.replaceAll("/+$", "")

  /** O10 (app/app.py:104-111): prepend `sourcePrefix` to filenames that
    * don't already start with it (`{prefix.rstrip('/')}/{filename}`).
    */
  def normalizeWithPrefix(filename: Column, sourcePrefix: String): Column =
    when(filename.startsWith(lit(sourcePrefix)), filename)
      .otherwise(concat(lit(rstripSlash(sourcePrefix) + "/"), filename))

  /** O11 (app/app.py:45-53): `path.replace(src, tgt, 1)` — replace only
    * the FIRST occurrence — and, when that is a no-op (src absent, or
    * src == tgt), fall back to `tgt.rstrip('/') + '/' + basename(path)`.
    */
  def rewriteFirstOccurrence(path: Column, sourcePrefix: String,
                             targetPrefix: String): Column = {
    val pos = locate(sourcePrefix, path) // 1-based; 0 when absent
    val replaced =
      if (sourcePrefix.isEmpty) concat(lit(targetPrefix), path) // Python ''-replace prepends
      else
        when(pos === 0, path).otherwise(concat(
          path.substr(lit(1), pos - 1),
          lit(targetPrefix),
          path.substr(pos + lit(sourcePrefix.length), length(path))))
    val fallback =
      concat(lit(rstripSlash(targetPrefix) + "/"), element_at(split(path, "/"), -1))
    when(replaced === path, fallback).otherwise(replaced)
  }

  /** O12 (app/main.py:153-159): strip the `sourcePath` prefix (else keep
    * the whole path), lstrip '/', prepend `targetPath.rstrip('/') + '/'`,
    * then collapse '//' → '/' in a single left-to-right pass.
    */
  def rewriteRelocate(path: Column, sourcePath: String, targetPath: String): Column = {
    val rel0 =
      when(path.startsWith(lit(sourcePath)),
        path.substr(lit(sourcePath.length + 1), length(path)))
        .otherwise(path)
    val rel = regexp_replace(rel0, "^/+", "")
    regexp_replace(concat(lit(rstripSlash(targetPath) + "/"), rel), "//", "/")
  }

  /** basename: last '/'-separated segment (app/app.py:51, app/main.py:168). */
  def basename(path: Column): Column = element_at(split(path, "/"), -1)

  /** dirname: everything before the last '/', "" when no '/' —
    * `'/'.join(path.split('/')[:-1])` (app/main.py:167-168).
    */
  def dirname(path: Column): Column =
    when(path.contains("/"), regexp_replace(path, "/[^/]*$", ""))
      .otherwise(lit(""))
}
