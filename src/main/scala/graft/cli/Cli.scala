package graft.cli

/** The reference CLI surface (`src/cli.rs:12-52`): 10 options with the same
  * names, shorts, defaults, conflict rules and validation. The two URL
  * options map onto this engine's file-backed world: `--rpc-url` is the
  * slot-blocks directory (the replayable RPC), `--database-url` the output
  * tables directory.
  */
final case class Config(
    startSlot: Option[Long] = None,          // -s, --start-slot (default latest-30)
    endSlot: Option[Long] = None,            // -e, --end-slot   (default latest-20)
    numBlocks: Option[Long] = None,          // -n, --num-blocks (conflicts with end-slot)
    rpcUrl: Option[String] = None,           // -r, --rpc-url    (blocks dir)
    databaseUrl: Option[String] = None,      // -d, --database-url (tables dir)
    batchSize: Int = 10,                     // -b, --batch-size
    maxRetries: Int = 3,                     //     --max-retries
    retryDelay: Long = 2L,                   //     --retry-delay (seconds)
    continuous: Boolean = false,             // -c, --continuous
    interval: Long = 10L) {                  //     --interval (seconds)

  /** cli.rs:56-72 — same three rules, same messages' intent. */
  def validate(): Either[String, Config] =
    if (startSlot.zip(endSlot).exists { case (s, e) => s > e })
      Left(s"Start slot (${startSlot.get}) must be less than or equal to end slot (${endSlot.get})")
    else if (batchSize <= 0) Left("Batch size must be greater than 0")
    else if (maxRetries <= 0) Left("Max retries must be greater than 0")
    else Right(this)

  /** cli.rs:75-83 — num-blocks arithmetic, else end-slot, else 10 blocks. */
  def calculateEndSlot(startSlot: Long): Long =
    numBlocks.map(startSlot + _ - 1)
      .orElse(endSlot)
      .getOrElse(startSlot + 9)
}

object Cli {

  /** Parse the reference's option grammar. Unknown options and a
    * `--num-blocks`/`--end-slot` conflict (cli.rs:22) are errors.
    */
  def parse(args: Seq[String]): Either[String, Config] = {
    @annotation.tailrec
    def loop(rest: List[String], c: Config): Either[String, Config] = rest match {
      case Nil => Right(c)
      case ("-s" | "--start-slot") :: v :: t => loop(t, c.copy(startSlot = Some(v.toLong)))
      case ("-e" | "--end-slot") :: v :: t => loop(t, c.copy(endSlot = Some(v.toLong)))
      case ("-n" | "--num-blocks") :: v :: t => loop(t, c.copy(numBlocks = Some(v.toLong)))
      case ("-r" | "--rpc-url") :: v :: t => loop(t, c.copy(rpcUrl = Some(v)))
      case ("-d" | "--database-url") :: v :: t => loop(t, c.copy(databaseUrl = Some(v)))
      case ("-b" | "--batch-size") :: v :: t => loop(t, c.copy(batchSize = v.toInt))
      case "--max-retries" :: v :: t => loop(t, c.copy(maxRetries = v.toInt))
      case "--retry-delay" :: v :: t => loop(t, c.copy(retryDelay = v.toLong))
      case ("-c" | "--continuous") :: t => loop(t, c.copy(continuous = true))
      case "--interval" :: v :: t => loop(t, c.copy(interval = v.toLong))
      case other :: _ => Left(s"Unknown or incomplete option: $other")
    }
    try
      loop(args.toList, Config()).flatMap { c =>
        if (c.numBlocks.isDefined && c.endSlot.isDefined)
          Left("--num-blocks conflicts with --end-slot")
        else c.validate()
      }
    catch { case e: NumberFormatException => Left(s"Invalid numeric argument: ${e.getMessage}") }
  }
}
