package graft.store

import graft.model._

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, ObjectInputStream, ObjectOutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.util.concurrent.atomic.AtomicBoolean

/** A wire transport for the [[BigtableStore]] seam, JDK-only (no gRPC
  * jars exist offline): [[SocketBigtableServer]] hosts any store behind
  * a TCP listener, [[SocketBigtableStore]] is the client-side
  * [[BigtableStore]] whose every call crosses the socket. This proves
  * the same boundary the reference crosses with its gRPC channel
  * (reference: src/datasource.rs:81-88 — `BigTableConnection::new` per
  * executor; src/execute_plan.rs:169-183 — one `ReadRows` request per
  * scan): executors need only the trait plus a (host, port) address,
  * never a shared JVM or a serialized snapshot. Swapping this transport
  * for a real Bigtable gRPC client is a client-class change — nothing
  * in the connector, composer, or readers moves.
  *
  * Protocol (Java object streams over TCP, one request per connection):
  * the client writes one [[SocketProtocol.Request]]; the server answers
  * with a stream of [[SocketProtocol.Response]] messages — `RowsBatch`
  * chunks (bounded, so neither side materializes a scan) terminated by
  * `Done`, a single `Value` for the scalar RPCs, or `Failure` carrying
  * the remote error (re-thrown client-side with the original message,
  * so the mandatory-filter guard and unknown-table errors keep their
  * shape across the hop).
  */
object SocketProtocol {
  sealed trait Request extends Serializable
  final case class ReadRows(table: String, ranges: Seq[RowRange], filters: Seq[RowFilter]) extends Request
  final case class SampleRowKeys(table: String) extends Request
  final case class EstimateSize(table: String, ranges: Seq[RowRange]) extends Request
  final case class MutateRows(table: String, mutations: Seq[(String, Seq[BtCell])]) extends Request
  final case class TruncateTable(table: String) extends Request

  sealed trait Response extends Serializable
  final case class RowsBatch(rows: Seq[BtRow]) extends Response
  case object Done extends Response
  final case class Value(v: Any) extends Response
  final case class Failure(className: String, message: String) extends Response

  /** Rows per RowsBatch frame: bounds both sides' memory while keeping
    * per-object-stream overhead amortized.
    */
  val BatchRows = 512

  /** JEP-290 deserialization whitelist applied to BOTH stream ends: only
    * the protocol's own model/collection classes may materialize —
    * anything else (a gadget-chain class planted by a hostile peer)
    * rejects before construction. Array classes are matched by element
    * type, so the graft/scala/java patterns cover the Seq internals.
    */
  val inputFilter: java.io.ObjectInputFilter =
    java.io.ObjectInputFilter.Config.createFilter(
      "graft.**;scala.**;java.lang.**;java.util.**;java.math.**;maxdepth=128;!*")
}

/** Serves a backing [[BigtableStore]] over a localhost TCP socket.
  * Handles each connection on its own daemon thread (concurrent scans
  * from many executor tasks), streams `readRows` results in bounded
  * batches, and resets the object stream per batch so the server never
  * accumulates back-references to rows already sent.
  */
final class SocketBigtableServer(backing: BigtableStore, bindAddress: String = "127.0.0.1") {
  import SocketProtocol._

  // loopback-only (ADVICE r13): the protocol deserializes Java objects,
  // so a non-loopback bind would expose a deserialization gadget surface
  // to anything that can reach the port. A real deployment swaps this
  // transport for the Bigtable gRPC proto (authenticated, schema-typed);
  // until then refuse to listen beyond localhost, and filter the stream
  // to the protocol's own classes regardless (defense in depth).
  private val addr = InetAddress.getByName(bindAddress)
  require(addr.isLoopbackAddress,
    s"SocketBigtableServer binds loopback only, got $bindAddress — the java-serialization " +
      "transport must not be exposed beyond localhost")

  private val server = new ServerSocket(0, 64, addr)
  private val running = new AtomicBoolean(true)

  val port: Int = server.getLocalPort
  val host: String = bindAddress

  private val acceptThread = new Thread(() => {
    while (running.get()) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), s"socket-bigtable-conn-${sock.getPort}")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: Throwable if !running.get() => () // closed during shutdown
        case _: Throwable                   => () // accept hiccup; keep serving
      }
    }
  }, s"socket-bigtable-accept-$port")
  acceptThread.setDaemon(true)
  acceptThread.start()

  /** A [[SocketBigtableStore]] addressing this server. */
  def clientStore: SocketBigtableStore = new SocketBigtableStore(host, port)

  private def handle(sock: Socket): Unit = {
    try {
      sock.setTcpNoDelay(true)
      val out = new ObjectOutputStream(new BufferedOutputStream(sock.getOutputStream))
      out.flush() // release the stream header before the client writes
      val in = new ObjectInputStream(new BufferedInputStream(sock.getInputStream))
      in.setObjectInputFilter(inputFilter)
      in.readObject() match {
        case ReadRows(table, ranges, filters) =>
          try {
            val it = backing.readRows(table, ranges, filters)
            val batch = Vector.newBuilder[BtRow]
            var n = 0
            while (it.hasNext) {
              batch += it.next()
              n += 1
              if (n == BatchRows) {
                out.writeObject(RowsBatch(batch.result()))
                out.reset() // drop handle table: frames stay independent
                out.flush()
                batch.clear()
                n = 0
              }
            }
            if (n > 0) { out.writeObject(RowsBatch(batch.result())); out.reset() }
            out.writeObject(Done)
            out.flush()
          } catch { case e: Throwable => sendFailure(out, e) }
        case SampleRowKeys(table) =>
          reply(out)(backing.sampleRowKeys(table))
        case EstimateSize(table, ranges) =>
          reply(out)(backing.estimateSize(table, ranges))
        case MutateRows(table, mutations) =>
          backing match {
            case m: MutableBigtableStore => reply(out) { m.mutateRows(table, mutations); () }
            case _ => sendFailure(out, new UnsupportedOperationException(
              s"store behind socket server does not accept writes (table $table)"))
          }
        case TruncateTable(table) =>
          backing match {
            case m: MutableBigtableStore => reply(out) { m.truncateTable(table); () }
            case _ => sendFailure(out, new UnsupportedOperationException(
              s"store behind socket server does not accept writes (table $table)"))
          }
        case other =>
          sendFailure(out, new IllegalArgumentException(s"unknown request: $other"))
      }
    } catch {
      case _: Throwable => () // client went away mid-request; drop the connection
    } finally {
      try sock.close() catch { case _: Throwable => () }
    }
  }

  private def reply(out: ObjectOutputStream)(body: => Any): Unit =
    try { out.writeObject(Value(body)); out.flush() }
    catch { case e: Throwable => sendFailure(out, e) }

  private def sendFailure(out: ObjectOutputStream, e: Throwable): Unit =
    try {
      out.writeObject(Failure(e.getClass.getName, Option(e.getMessage).getOrElse("")))
      out.flush()
    } catch { case _: Throwable => () }

  def close(): Unit = {
    running.set(false)
    try server.close() catch { case _: Throwable => () }
  }
}

/** Client-side [[BigtableStore]] whose state is exactly (host, port) —
  * the shape a Spark task closure should carry (the reference ships
  * project/instance addressing and dials executor-side the same way,
  * datasource.rs:81-88). Each RPC opens a fresh connection; `readRows`
  * returns a LAZY iterator that pulls one bounded batch frame at a time,
  * so a scan partition streams across the wire without either side
  * materializing it. Implements the mutable surface too — servers over
  * a read-only store reject writes with a remote error.
  */
final class SocketBigtableStore(host: String, port: Int)
    extends MutableBigtableStore {
  import SocketProtocol._

  private def connect(req: Request): (Socket, ObjectInputStream) = {
    val sock = new Socket(host, port)
    sock.setTcpNoDelay(true)
    val out = new ObjectOutputStream(new BufferedOutputStream(sock.getOutputStream))
    out.writeObject(req)
    out.flush()
    val in = new ObjectInputStream(new BufferedInputStream(sock.getInputStream))
    in.setObjectInputFilter(SocketProtocol.inputFilter)
    (sock, in)
  }

  private def rethrow(f: Failure): Nothing = {
    val msg = s"${f.message} (remote ${f.className} via socket store $host:$port)"
    // keep the remote error's shape where callers pattern-match on it
    f.className match {
      case "java.lang.IllegalArgumentException"          => throw new IllegalArgumentException(msg)
      case "java.lang.IllegalStateException"             => throw new IllegalStateException(msg)
      case "java.lang.UnsupportedOperationException"     => throw new UnsupportedOperationException(msg)
      case "graft.store.TransientStoreException"         => throw new TransientStoreException(msg)
      case _                                             => throw new RuntimeException(msg)
    }
  }

  private def scalar[T](req: Request): T = {
    val (sock, in) = connect(req)
    try in.readObject() match {
      case Value(v)   => v.asInstanceOf[T]
      case f: Failure => rethrow(f)
      case other      => throw new IllegalStateException(s"unexpected response: $other")
    } finally sock.close()
  }

  override def readRows(
      table: String,
      ranges: Seq[RowRange],
      filters: Seq[RowFilter]
  ): Iterator[BtRow] = {
    require(
      ranges.nonEmpty,
      "readRows requires at least one RowRange; use Seq(RowRange.full) for an explicit full scan"
    )
    val (sock, in) = connect(ReadRows(table, ranges, filters))
    // AutoCloseable: a partially-consumed scan (pushed limit/topN via
    // take(n), task abort) must be able to release the socket —
    // BigtablePivot.GroupIterator forwards PartitionReader.close() here.
    // Closing client-side also unblocks the server's per-connection
    // writer thread (its next write fails instead of waiting on a full
    // TCP buffer until JVM exit).
    new Iterator[BtRow] with AutoCloseable {
      private var buf: Iterator[BtRow] = Iterator.empty
      private var closed = false

      private def closeAll(): Unit =
        if (!closed) { closed = true; try sock.close() catch { case _: Throwable => () } }

      override def close(): Unit = closeAll()

      @annotation.tailrec
      private def refill(): Boolean = {
        if (closed) false
        else if (buf.hasNext) true
        else {
          // EOF before the Done frame = the server (or network) dropped
          // the connection mid-scan. This must NOT read as a clean end —
          // silently truncating a scan is data loss — it is a transient
          // transport fault: RetryingStore resumes past the last
          // delivered key over a fresh connection, exactly like the real
          // Bigtable client restarts a broken ReadRows stream.
          val msg =
            try in.readObject()
            catch {
              case _: EOFException =>
                closeAll()
                throw new TransientStoreException(
                  s"socket scan connection closed mid-stream before Done ($host:$port)")
              case e: java.io.IOException =>
                closeAll()
                throw new TransientStoreException(
                  s"socket scan connection failed mid-stream: ${e.getMessage} ($host:$port)")
            }
          msg match {
            case RowsBatch(rows) =>
              buf = rows.iterator
              refill() // an empty frame is legal; keep pulling
            case Done       => closeAll(); false
            case f: Failure => closeAll(); rethrow(f)
            case other      => closeAll(); throw new IllegalStateException(s"unexpected frame: $other")
          }
        }
      }

      override def hasNext: Boolean = refill()
      override def next(): BtRow = {
        if (!hasNext) throw new NoSuchElementException("exhausted socket scan")
        buf.next()
      }
    }
  }

  override def sampleRowKeys(table: String): Seq[String] =
    scalar[Seq[String]](SampleRowKeys(table))

  override def estimateSize(table: String, ranges: Seq[RowRange]): Option[(Long, Long)] =
    scalar[Option[(Long, Long)]](EstimateSize(table, ranges))

  override def mutateRows(table: String, mutations: Seq[(String, Seq[BtCell])]): Unit =
    scalar[Unit](MutateRows(table, mutations))

  override def truncateTable(table: String): Unit =
    scalar[Unit](TruncateTable(table))
}
