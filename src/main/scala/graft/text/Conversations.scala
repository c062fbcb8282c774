package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Chat-format (SFT/RLHF) conversation curation — the post-training
  * counterpart of the document operators: instruction datasets arrive
  * as JSON turn lists (`[{"role": "user", "content": …}, …]`) and the
  * pipeline must validate their SHAPE (roles alternate, user speaks
  * first, assistant answers last) before any text-level quality rule
  * applies. Everything here is native Column work over `from_json` —
  * row-local, no UDF, no shuffle; malformed JSON parses to NULL and
  * flows through as NULL stats (bad rows are data, the library-wide
  * codec contract), never an error.
  *
  * (The reference has no chat format — this extends the engine to the
  * dataset shape modern training runs actually consume.) */
object Conversations {

  /** The turn-list schema `from_json` parses: role + content per turn.
    * Extra JSON fields are ignored; missing fields parse as NULL. */
  val turnSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType), StructField("content", StringType))))

  /** Parsed turns array (NULL for malformed JSON — from_json in its
    * default permissive mode; ANSI does not apply to parse errors). */
  def parseTurns(json: Column): Column = from_json(json, turnSchema)

  /** One flat training string: `user: hi\nassistant: hello` — the
    * render step before tokenization/packing. NULL for malformed. */
  def flatten(json: Column, sep: String = "\n"): Column = {
    val turns = parseTurns(json)
    array_join(transform(turns,
      t => concat_ws(": ", t.getField("role"), t.getField("content"))), sep)
  }

  /** `df` plus the shape/volume columns curation filters on:
    *   - `n_turns`, `n_user`, `n_assistant` — turn counts
    *   - `n_chars_user` / `n_chars_assistant` — content volume per side
    *     (NULL contents count 0 — a missing field is absent volume)
    *   - `well_formed` — every role is user|assistant|system, roles
    *     after an optional leading system turn ALTERNATE starting with
    *     user and end with assistant (the canonical SFT shape)
    *   - `text` — the flattened rendering
    * Malformed JSON → all NULL (and well_formed NULL, not false:
    * unparseable is unknown, the decontamination "unknown ≠ dirty"
    * contract — filter on `well_formed` IS NULL OR NOT well_formed to
    * drop both). */
  def withConversationStats(df: DataFrame, jsonCol: String): DataFrame = {
    val turns = parseTurns(col(jsonCol))
    val roles = transform(turns, t => t.getField("role"))
    // roles after the optional leading system turn
    // try_element_at, not element_at: ANSI element_at THROWS on an
    // empty array, and And does not guarantee short-circuit
    val body = when(try_element_at(roles, lit(1)) === "system",
      slice(roles, lit(2), greatest(size(roles) - 1, lit(0)))).otherwise(roles)
    def charsOf(role: String): Column = aggregate(
      filter(turns, t => t.getField("role") === role),
      lit(0L), (acc, t) => acc + coalesce(length(t.getField("content")).cast("long"), lit(0L)))
    val validRoles = forall(roles,
      r => r.isin("user", "assistant", "system"))
    // body must alternate user/assistant starting with user: turn i
    // (1-based) is "user" iff i is odd
    val alternates = forall(zip_with(body, sequence(lit(1), size(body)),
      (r, i) => r === when(i % 2 === 1, "user").otherwise("assistant")),
      x => x)
    val wellFormed = validRoles && size(body) > 0 &&
      alternates && (size(body) % 2 === 0)
    df.withColumn("n_turns", size(turns))
      .withColumn("n_user", size(filter(turns, t => t.getField("role") === "user")))
      .withColumn("n_assistant",
        size(filter(turns, t => t.getField("role") === "assistant")))
      .withColumn("n_chars_user", when(turns.isNull, lit(null).cast("long"))
        .otherwise(charsOf("user")))
      .withColumn("n_chars_assistant", when(turns.isNull, lit(null).cast("long"))
        .otherwise(charsOf("assistant")))
      .withColumn("well_formed", when(turns.isNull, lit(null).cast("boolean"))
        .otherwise(wellFormed))
      .withColumn("text", flatten(col(jsonCol)))
  }
}
