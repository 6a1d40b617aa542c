package graft.schema

/** Pretty box-drawing schema tree — the reference's `describe()`
  * (`src/load_datawarehouse/bigquery/schema.py:301-434`): three aligned
  * columns (name / type / mode), nested records indented with box-drawing
  * guides, returned as a string (the reference also prints; we leave
  * printing to the caller).
  */
object Describe {

  final case class Options(nameWidth: Int = 32, typeWidth: Int = 10,
                           modeWidth: Int = 9, indent: Int = 3)

  def apply(tableName: String, fields: Seq[FieldRepr],
            opts: Options = Options()): String = {
    val sb = new StringBuilder
    sb.append(tableName).append('\n')
    sb.append("─" * (opts.nameWidth + opts.typeWidth + opts.modeWidth + 2)).append('\n')
    renderFields(sb, fields, prefix = "", opts)
    sb.result()
  }

  private def renderFields(sb: StringBuilder, fields: Seq[FieldRepr],
                           prefix: String, opts: Options): Unit = {
    fields.zipWithIndex.foreach { case (f, i) =>
      val last = i == fields.size - 1
      val branch = if (last) "└─ " else "├─ "
      val namePart = prefix + branch + f.name
      val padded =
        if (namePart.length >= opts.nameWidth) namePart + " "
        else namePart + (" " * (opts.nameWidth - namePart.length))
      sb.append(padded)
        .append(pad(f.fieldType, opts.typeWidth))
        .append(pad(f.mode, opts.modeWidth))
        .append('\n')
      if (f.fields.nonEmpty) {
        val childPrefix = prefix + (if (last) "   " else "│  ")
        renderFields(sb, f.fields, childPrefix, opts)
      }
    }
  }

  private def pad(s: String, w: Int): String =
    if (s.length >= w) s + " " else s + (" " * (w - s.length))
}
