package graft.query

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** L6 chat-persistence semantics on the append-only log, pinned against
  * the reference's SQLite behavior (`app_new.py:19-107`): cascade
  * delete, re-create starts a clean epoch, rename wins over create
  * title, `对话 - {id}` fallback, recency-ordered listing, and
  * durability across a reload (separate read of the same directory).
  */
class ChatStoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ev(rows: Seq[(Long, String, String, Option[String],
      Option[String], Option[String])]) = {
    import spark.implicits._
    rows.toDF("seq", "op", "chat_id", "title", "role", "content")
  }

  test("create/message/rename/delete fold to the reference's observable state") {
    import spark.implicits._
    val dir = Files.createTempDirectory("chatlog").toString + "/log"
    ChatStore.append(ev(Seq(
      (1L, "create", "a", Some("First"), None, None),
      (2L, "message", "a", None, Some("user"), Some("hi")),
      (3L, "create", "b", None, None, None),          // no title -> fallback
      (4L, "message", "b", None, Some("user"), Some("x")),
      (5L, "message", "a", None, Some("assistant"), Some("yo")))), dir)
    // second batch: rename a, delete b — append, not overwrite
    ChatStore.append(ev(Seq(
      (6L, "rename", "a", Some("Renamed"), None, None),
      (7L, "delete", "b", None, None, None))), dir)

    val log = ChatStore.load(spark, dir)
    val cs = ChatStore.chats(log)
      .as[(String, String, Long, Long)].collect().toSeq
    // b is gone (cascade); a's title is the rename, but last_seq is its
    // last MESSAGE (5), not the rename (6) — update_chat_title_in_db
    // does not bump last_updated_at in the reference
    assert(cs === Seq(("a", "Renamed", 2L, 5L)))
    // history: oldest first, role+content; deleted chat reads empty
    val ha = ChatStore.messages(log, "a")
      .as[(Long, String, String)].collect().toSeq
    assert(ha === Seq((2L, "user", "hi"), (5L, "assistant", "yo")))
    assert(ChatStore.messages(log, "b").isEmpty)

    // re-create b: clean epoch — the old message never resurfaces
    ChatStore.append(ev(Seq(
      (8L, "create", "b", None, None, None),
      (9L, "message", "b", None, Some("user"), Some("fresh")))), dir)
    val log2 = ChatStore.load(spark, dir)
    val cs2 = ChatStore.chats(log2)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(cs2 === Seq(
      ("b", "对话 - b", 1L, 9L),  // fallback title, newest first
      ("a", "Renamed", 2L, 5L)))
    assert(ChatStore.messages(log2, "b")
      .as[(Long, String, String)].collect().toSeq ===
      Seq((9L, "user", "fresh")))

    // compaction: dead epochs and superseded events vanish from the log,
    // but every observable — listing, history, fallback title — reads
    // identically (a's rename survives compaction to keep its title)
    val before = (cs2, ha)
    ChatStore.compact(spark, dir)
    val log3 = ChatStore.load(spark, dir)
    assert(ChatStore.chats(log3)
      .as[(String, String, Long, Long)].collect().toSeq === before._1)
    assert(ChatStore.messages(log3, "a")
      .as[(Long, String, String)].collect().toSeq === before._2)
    // b's DELETED epoch (seq 4's message, the delete itself) is gone:
    // the log shrank to creates + a's rename + the 3 live messages
    assert(log3.count() === 2 + 1 + 3)
    assert(log3.filter("op = 'delete'").count() === 0)
    // the swap left no stray temp copy behind
    assert(!new java.io.File(dir + ".compact").exists())
  }

  test("prune drops dead epochs physically; folds read identically; idempotent") {
    import spark.implicits._
    val dir = Files.createTempDirectory("chatlog_prune").toString + "/log"
    ChatStore.append(ev(Seq(
      (1L, "create", "a", Some("First"), None, None),
      (2L, "message", "a", None, Some("user"), Some("hi")),
      (3L, "create", "b", Some("Doomed"), None, None),
      (4L, "message", "b", None, Some("user"), Some("secret")),
      (5L, "rename", "a", Some("Renamed"), None, None),
      (6L, "delete", "b", None, None, None),
      // b re-created after its delete: the NEW epoch must survive prune
      (7L, "create", "b", None, None, None),
      (8L, "message", "b", None, Some("user"), Some("fresh")))), dir)

    val before = ChatStore.chats(ChatStore.load(spark, dir))
      .as[(String, String, Long, Long)].collect().toSeq
    ChatStore.prune(spark, dir)
    val pruned = ChatStore.load(spark, dir)

    // observable state identical (prune = materialize `effective`)
    assert(ChatStore.chats(pruned)
      .as[(String, String, Long, Long)].collect().toSeq === before)
    assert(ChatStore.messages(pruned, "a")
      .as[(Long, String, String)].collect().toSeq ===
      Seq((2L, "user", "hi")))
    assert(ChatStore.messages(pruned, "b")
      .as[(Long, String, String)].collect().toSeq ===
      Seq((8L, "user", "fresh")))

    // the GDPR-shaped half the folds can't show: b's dead epoch —
    // create, 'secret' message AND the delete marker — is gone from disk,
    // while a's superseded-able events and b's new epoch survive verbatim
    val ops = pruned.groupBy($"op").count()
      .as[(String, Long)].collect().toMap
    assert(ops === Map("create" -> 2L, "message" -> 2L, "rename" -> 1L))
    assert(pruned.filter($"content" === "secret").isEmpty,
      "dead-epoch content must be physically gone")

    // idempotent: prune∘prune = prune (byte-identical surviving events)
    val snap = pruned.as[(Long, String, String, String, String, String)]
      .collect().toSet
    ChatStore.prune(spark, dir)
    assert(ChatStore.load(spark, dir)
      .as[(Long, String, String, String, String, String)]
      .collect().toSet === snap)

    // a delete appended AFTER a prune still cascades (the fence logic
    // needs no pruned history), and a re-create starts clean
    ChatStore.append(ev(Seq(
      (9L, "delete", "b", None, None, None),
      (10L, "create", "b", None, None, None))), dir)
    val log2 = ChatStore.load(spark, dir)
    assert(ChatStore.messages(log2, "b").isEmpty)
    assert(ChatStore.chats(log2)
      .as[(String, String, Long, Long)].collect().toSeq.map(_._1)
      === Seq("b", "a"))
  }

  test("empty stored title is falsy like the reference's `row[1] or ...`") {
    import spark.implicits._
    val dir = Files.createTempDirectory("chatlog_empty").toString + "/log"
    ChatStore.append(ev(Seq(
      (1L, "create", "a", Some("Real"), None, None),
      // renaming to '' leaves an empty STORED title; the reference lists
      // it as 对话 - a (SQLite keeps only the latest value, so the
      // fallback is the id form, never the superseded 'Real')
      (2L, "rename", "a", Some(""), None, None),
      (3L, "create", "b", Some(""), None, None))), dir)
    val cs = ChatStore.chats(ChatStore.load(spark, dir))
      .as[(String, String, Long, Long)].collect().toSeq
    assert(cs === Seq(
      ("b", "对话 - b", 0L, 3L),
      ("a", "对话 - a", 0L, 1L)))
  }

  test("a NULL rename overwrites a non-empty create title (latest value wins)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("chatlog_null").toString + "/log"
    ChatStore.append(ev(Seq(
      (1L, "create", "a", Some("Real"), None, None),
      // the reference stores the latest (NULL) value; `row[1] or ...`
      // then falls back to the ID FORM — a rename-over-create coalesce
      // would wrongly resurrect 'Real'
      (2L, "rename", "a", None, None, None))), dir)
    val cs = ChatStore.chats(ChatStore.load(spark, dir))
      .as[(String, String, Long, Long)].collect().toSeq
    assert(cs === Seq(("a", "对话 - a", 0L, 1L)))
  }
}
