package graft.query

import java.nio.file.Files
import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Model-based check of the L6 state folds: random APP-CONSISTENT event
  * logs (create first in an epoch; rename/message/delete only against a
  * live chat — the only sequences `app_new.py`'s UI can produce) are
  * folded by a trivially-auditable in-memory reference of the SQLite
  * semantics and compared row-for-row against `ChatStore.chats` /
  * `ChatStore.messages`. Catches fold edge cases the hand fixtures
  * don't enumerate: multiple delete/re-create cycles, rename storms,
  * NULL and empty titles interleaved, chats that never message.
  */
class ChatStoreFoldPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private case class Ev(seq: Long, op: String, chatId: String,
                        title: Option[String], role: Option[String],
                        content: Option[String])

  /** The reference fold — direct transliteration of the observable
    * SQLite behavior: per chat, state is rebuilt from the events after
    * its last delete; title is the LATEST stored value (create or
    * rename, NULL included) with the `row[1] or ...` falsy fallback;
    * last activity counts create+message only.
    */
  private def referenceChats(log: Seq[Ev]): Seq[(String, String, Long, Long)] = {
    val byChat = log.groupBy(_.chatId)
    byChat.toSeq.flatMap { case (id, evs0) =>
      val evs = evs0.sortBy(_.seq)
      val lastDel = evs.filter(_.op == "delete").map(_.seq).maxOption
      val epoch = lastDel.fold(evs)(d => evs.filter(_.seq > d))
        .filter(_.op != "delete")
      if (!epoch.exists(_.op == "create")) None
      else {
        val latestTitle = epoch.filter(e => e.op == "create" || e.op == "rename")
          .maxBy(_.seq).title
        val title = latestTitle.filter(_.nonEmpty).getOrElse(s"对话 - $id")
        val acts = epoch.filter(e => e.op == "create" || e.op == "message")
        Some((id, title,
          epoch.count(_.op == "message").toLong,
          acts.map(_.seq).max))
      }
    }.sortBy { case (id, _, _, last) => (-last, id) }
  }

  private def referenceMessages(log: Seq[Ev], id: String): Seq[(Long, String, String)] = {
    val evs = log.filter(_.chatId == id).sortBy(_.seq)
    val lastDel = evs.filter(_.op == "delete").map(_.seq).maxOption
    val epoch = lastDel.fold(evs)(d => evs.filter(_.seq > d))
    if (!epoch.exists(_.op == "create")) Nil
    else epoch.filter(_.op == "message")
      .map(e => (e.seq, e.role.get, e.content.get))
  }

  private def genLog(rnd: Random, n: Int): Seq[Ev] = {
    val ids = Vector("a", "b", "c", "d")
    var live = Set.empty[String]
    var seq = 0L
    val out = Seq.newBuilder[Ev]
    (1 to n).foreach { _ =>
      seq += 1
      val id = ids(rnd.nextInt(ids.size))
      def title(): Option[String] = rnd.nextInt(4) match {
        case 0 => None
        case 1 => Some("")
        case _ => Some(s"t${rnd.nextInt(5)}")
      }
      if (!live(id)) {
        out += Ev(seq, "create", id, title(), None, None)
        live += id
      } else rnd.nextInt(10) match {
        case 0 =>
          out += Ev(seq, "delete", id, None, None, None); live -= id
        case 1 | 2 =>
          out += Ev(seq, "rename", id, title(), None, None)
        case _ =>
          out += Ev(seq, "message", id,
            None, Some(if (seq % 2 == 0) "user" else "assistant"),
            Some(s"m$seq"))
      }
    }
    out.result()
  }

  test("random app-consistent logs: Spark folds == in-memory reference") {
    import spark.implicits._
    Seq(7L, 42L, 2026L).foreach { seed =>
      val log = genLog(new Random(seed), 150)
      val dir = Files.createTempDirectory(s"chatprop$seed").toString + "/log"
      // append in two batches to exercise the log-append path too
      val (b1, b2) = log.splitAt(log.size / 2)
      Seq(b1, b2).foreach { b =>
        ChatStore.append(
          b.map(e => (e.seq, e.op, e.chatId, e.title, e.role, e.content))
            .toDF("seq", "op", "chat_id", "title", "role", "content"), dir)
      }
      val loaded = ChatStore.load(spark, dir)
      val got = ChatStore.chats(loaded)
        .as[(String, String, Long, Long)].collect().toSeq
      assert(got === referenceChats(log), s"chats diverged at seed $seed")
      Seq("a", "b", "c", "d").foreach { id =>
        val gm = ChatStore.messages(loaded, id)
          .as[(Long, String, String)].collect().toSeq
        assert(gm === referenceMessages(log, id),
          s"messages($id) diverged at seed $seed")
      }
      // compaction must preserve every observable
      ChatStore.compact(spark, dir)
      val re = ChatStore.load(spark, dir)
      assert(ChatStore.chats(re)
        .as[(String, String, Long, Long)].collect().toSeq === got,
        s"post-compaction chats diverged at seed $seed")
    }
  }
}
