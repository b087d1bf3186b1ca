package graft

/** Dev micro-benchmarks for driver-side primitives (not part of the driver
  * contract). Usage: sbt "runMain graft.MicroProf [fsio|encode]"
  */
object MicroProf {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("fsio")
    mode match {
      case "fsio" => fsio()
      case "encode" => encode()
      case "tokens" => tokens()
    }
  }

  /** Encode chunks shaped like TokenGen's per-source token distributions,
    * several reps each, to expose rep-over-rep growth.
    */
  private def tokens(): Unit = {
    import graft.codec._
    val n = 262144
    val rng = new java.util.Random(11)
    val web = Array.fill(n)(math.min(49999, math.exp(rng.nextDouble() * math.log(50000.0)).toInt))
    val code = new Array[Int](n)
    var k = 0
    while (k < n) {
      val v = rng.nextInt(256)
      val run = math.min(n - k, 1 + rng.nextInt(16))
      java.util.Arrays.fill(code, k, k + run, v)
      k += run
    }
    val books = Array.fill(n)(30000 + rng.nextInt(512))
    val synth = new Array[Int](n)
    java.util.Arrays.fill(synth, 42)
    val docIds = Array.tabulate(4096)(i => f"doc$i%012d")
    for (rep <- 1 to 4) {
      for ((nm, a) <- Seq(("web", web), ("code", code), ("books", books), ("synth", synth))) {
        val t0 = System.nanoTime()
        val blob = Chunk.encodeWithInfo(IntVec(a), CodecConfig.default)
        println(f"rep$rep $nm%-6s ${(System.nanoTime() - t0) / 1e6}%8.1f ms codec=${blob._2.codec} outer=${blob._2.outer} bytes=${blob._1.length}")
      }
      val t0 = System.nanoTime()
      val blob = Chunk.encodeWithInfo(StrVec(docIds), CodecConfig.default)
      println(f"rep$rep docid  ${(System.nanoTime() - t0) / 1e6}%8.1f ms codec=${blob._2.codec} outer=${blob._2.outer} bytes=${blob._1.length}")
    }
  }

  private def timed(name: String, n: Int)(f: Int => Unit): Unit = {
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) { f(i); i += 1 }
    val dt = (System.nanoTime() - t0) / 1e6
    println(f"$name%-40s $n reps ${dt}%8.1f ms  (${dt * 1000 / n}%7.1f us/op)")
  }

  private def fsio(): Unit = {
    val base = s"/tmp/graft-microprof-${java.util.UUID.randomUUID().toString.take(8)}"
    graft.store.FsIO.mkdirs(base)
    val payload = Array.fill[Byte](2000)(42)
    timed("FsIO.writeAtomic (2KB)", 200)(i => graft.store.FsIO.writeAtomic(s"$base/f$i.bin", payload))
    timed("FsIO.readAll (2KB)", 200)(i => graft.store.FsIO.readAll(s"$base/f$i.bin"))
    timed("FsIO.list (200 entries)", 50)(_ => graft.store.FsIO.list(base))
    timed("FsIO.exists", 200)(i => graft.store.FsIO.exists(s"$base/f$i.bin"))
    val fs = graft.store.FsIO.fs(base)
    timed("hadoop create+close (2KB)", 200) { i =>
      val out = fs.create(new org.apache.hadoop.fs.Path(s"$base/h$i.bin"), true)
      out.write(payload); out.close()
    }
    timed("hadoop open+readFully (2KB)", 200) { i =>
      val in = fs.open(new org.apache.hadoop.fs.Path(s"$base/h$i.bin"))
      val buf = new Array[Byte](2000)
      in.readFully(0, buf); in.close()
    }
    timed("hadoop rename", 100) { i =>
      fs.rename(new org.apache.hadoop.fs.Path(s"$base/h$i.bin"),
        new org.apache.hadoop.fs.Path(s"$base/r$i.bin"))
    }
    val nioBase = java.nio.file.Paths.get(base)
    timed("nio write (2KB)", 200)(i =>
      java.nio.file.Files.write(nioBase.resolve(s"n$i.bin"), payload))
    timed("nio read (2KB)", 200)(i =>
      java.nio.file.Files.readAllBytes(nioBase.resolve(s"n$i.bin")))
    timed("nio write+atomic move (2KB)", 200) { i =>
      val tmp = nioBase.resolve(s"t$i.tmp")
      java.nio.file.Files.write(tmp, payload)
      java.nio.file.Files.move(tmp, nioBase.resolve(s"m$i.bin"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    timed("nio list (800 entries)", 50) { _ =>
      val s = java.nio.file.Files.list(nioBase)
      try s.count() finally s.close()
    }
    graft.store.FsIO.delete(base, recursive = true)
  }

  private def encode(): Unit = {
    import graft.codec._
    // documents-like text chunk: 512 rows x ~500 chars
    val rng = new java.util.Random(7)
    def word(): String = {
      val n = 3 + rng.nextInt(8)
      val sb = new StringBuilder
      (0 until n).foreach(_ => sb.append(('a' + rng.nextInt(26)).toChar))
      sb.toString
    }
    val texts512 = Array.fill(512)((0 until 80).map(_ => word()).mkString(" "))
    val texts64 = texts512.take(64)
    timed("Chunk.encode text 512 rows (~40KB)", 20)(_ =>
      Chunk.encodeWithInfo(StrVec(texts512), CodecConfig.default))
    timed("Chunk.encode text 64 rows (~5KB)", 100)(_ =>
      Chunk.encodeWithInfo(StrVec(texts64), CodecConfig.default))
    val sample = texts512.mkString(" ").getBytes("UTF-8")
    timed("Fsst.buildTable 64KB sample", 20)(_ =>
      Fsst.buildTable(java.util.Arrays.copyOf(sample, math.min(sample.length, 1 << 16))))
    timed("Fsst.buildTable 5KB sample", 100)(_ =>
      Fsst.buildTable(java.util.Arrays.copyOf(sample, 5000)))
    // token-like int chunk
    val ints = Array.fill(262144)(rng.nextInt(50000))
    timed("Chunk.encode i32 262144 values", 20)(_ =>
      Chunk.encodeWithInfo(IntVec(ints), CodecConfig.default))
    val longs = ints.map(_.toLong)
    timed("intStats 262144 longs", 50)(_ => Chunk.intStats(longs, 1 << 14))
  }
}
