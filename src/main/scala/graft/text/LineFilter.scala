package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style LINE-level cleaning (Raffel et al. 2020 §2.2): the web-corpus
  * rules applied per line before any document-level scoring — keep a line
  * only if it has enough words, terminates like prose (ends in terminal
  * punctuation), and carries none of the boilerplate markers ("enable
  * javascript", cookie banners); drop the whole document if it shows
  * template artifacts (a curly brace, in C4's rule) or keeps no lines.
  *
  * Shape at scale: the entire operator is ONE projection — split on
  * newline, `filter` the line array, `array_join` back — no explode, no
  * shuffle, no window; a 100 TB corpus pays exactly its scan. The lambda
  * chain evaluates per line once (bounded by text length), not per
  * (line, rule) re-derivation of the split.
  */
object LineFilter {

  /** Per-line keep predicate: >= minWords whitespace words, ends in
    * `.`/`!`/`?`, and contains no banned substring (case-insensitive).
    */
  private def lineKeep(l: Column, minWords: Int, banned: Seq[String]): Column =
    banned.foldLeft(
      size(split(l, " ")) >= minWords && l.rlike("[.!?]$")) {
      (acc, b) => acc && !lower(l).contains(b.toLowerCase)
    }

  /** (id, n_lines, n_lines_kept, text_clean, doc_keep) for every input
    * row. `doc_keep` = no `{` anywhere in the ORIGINAL text (the C4
    * template-artifact rule — code/JS fragments masquerading as prose)
    * and at least one surviving line.
    */
  def c4Lines(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minWords: Int = 5,
      banned: Seq[String] = Seq("javascript", "cookies")): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => lineKeep(l, minWords, banned))
    df.select(
      col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_lines_kept"),
      array_join(kept, "\n").as("text_clean"),
      (!col(textCol).contains("{") && size(kept) > 0).as("doc_keep"))
  }
}
