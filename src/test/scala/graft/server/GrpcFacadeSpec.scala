package graft.server

import graft.SparkSpec
import org.sparkproject.connect.grpc.StatusRuntimeException

class GrpcFacadeSpec extends SparkSpec {

  private lazy val facade = new GrpcFacade(spark, sfDir, 0) // ephemeral port
  private lazy val ch = GrpcFacade.channel(facade.start())

  override def afterAll(): Unit = {
    ch.shutdownNow(); facade.stop(); super.afterAll()
  }

  // ---- tiny TableResponse / RowResponse decoders over the same wire codec
  private def headersOf(r: Proto.Reader): Seq[(String, String)] =
    r.fields.getOrElse(1, Nil).map { h =>
      val hr = new Proto.Reader(h.asInstanceOf[Array[Byte]])
      (hr.str(1).get, hr.str(2).get)
    }
  private def columnsOf(bytes: Seq[Any]): Seq[Any] = bytes.map { c =>
    val cr = new Proto.Reader(c.asInstanceOf[Array[Byte]])
    cr.fields.headOption match {
      case None => null
      case Some((1, v)) => new String(v.head.asInstanceOf[Array[Byte]], "UTF-8")
      case Some((f, v)) if f == 2 || f == 3 => v.head
      case Some((4, v)) => v.head == 1L
      case Some((10, v)) => new String(v.head.asInstanceOf[Array[Byte]], "UTF-8")
      case Some((f, v)) => (f, v.head)
    }
  }
  private def tableRows(r: Proto.Reader): Seq[Seq[Any]] =
    r.fields.getOrElse(2, Nil).map { row =>
      columnsOf(new Proto.Reader(row.asInstanceOf[Array[Byte]]).fields.getOrElse(1, Nil))
    }

  test("QuerySQLUnary returns a typed TableResponse over the wire") {
    val resp = new Proto.Reader(GrpcFacade.call(ch, facade.QuerySqlUnaryMethod,
      GrpcFacade.sqlRequest("SELECT TOP(3) r_regionkey, r_name FROM region ORDER BY r_regionkey")))
    assert(headersOf(resp) == Seq(("r_regionkey", "int64"), ("r_name", "string")))
    assert(tableRows(resp) == Seq(Seq(0L, "AFRICA"), Seq(1L, "AMERICA"), Seq(2L, "ASIA")))
  }

  test("QueryPQLUnary: Count result and write ack (grpc.go:346-405,621-639)") {
    val cnt = new Proto.Reader(GrpcFacade.call(ch, facade.QueryPqlUnaryMethod,
      GrpcFacade.pqlRequest("region", "Count(Row(r_regionkey=0))")))
    assert(headersOf(cnt).map(_._1) == Seq("cnt"))
    assert(tableRows(cnt) == Seq(Seq(1L)))
    // a write acks as the ResultBool table and is visible to the next query
    val ack = new Proto.Reader(GrpcFacade.call(ch, facade.QueryPqlUnaryMethod,
      GrpcFacade.pqlRequest("region", "Set(42, r_name='GRPCLAND')")))
    assert(headersOf(ack) == Seq(("result", "bool")))
    assert(tableRows(ack) == Seq(Seq(true)))
    val after = new Proto.Reader(GrpcFacade.call(ch, facade.QueryPqlUnaryMethod,
      GrpcFacade.pqlRequest("region", "Count(Row(r_name='GRPCLAND'))")))
    assert(tableRows(after) == Seq(Seq(1L)))
  }

  test("QueryPQLUnary rejects multi-call programs like the reference") {
    val e = intercept[StatusRuntimeException] {
      GrpcFacade.call(ch, facade.QueryPqlUnaryMethod,
        GrpcFacade.pqlRequest("region", "Count(All()) Count(All())"))
    }
    assert(e.getMessage.contains("exactly one query"))
  }

  test("QuerySQL streams one RowResponse per row, headers first") {
    val msgs = GrpcFacade.serverStream(ch, facade.QuerySqlMethod,
      GrpcFacade.sqlRequest("SELECT r_regionkey FROM region ORDER BY r_regionkey"))
      .map(new Proto.Reader(_))
    assert(msgs.length == 5)
    assert(headersOf(msgs.head) == Seq(("r_regionkey", "int64")))
    assert(msgs.tail.forall(m => m.fields.get(1).isEmpty)) // headers only on first
    val vals = msgs.map(m => columnsOf(m.fields.getOrElse(2, Nil)).head)
    assert(vals == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("errors surface as INVALID_ARGUMENT status") {
    val e = intercept[StatusRuntimeException] {
      GrpcFacade.call(ch, facade.QuerySqlUnaryMethod,
        GrpcFacade.sqlRequest("SELECT nope FROM region"))
    }
    assert(e.getMessage.contains("INVALID_ARGUMENT"))
  }
}
