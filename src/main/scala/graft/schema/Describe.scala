package graft.schema

/** Pretty box-drawing schema tree — the reference's `describe()`
  * (`src/load_datawarehouse/bigquery/schema.py:301-434`): three aligned
  * columns (name / type / mode), nested records indented with box-drawing
  * guides. Like the reference (`echo=True`, print at :433), the tree is
  * BOTH printed to stdout and returned; pass `echo = false` for the
  * pure-function form.
  */
object Describe {

  final case class Options(nameWidth: Int = 32, typeWidth: Int = 10,
                           modeWidth: Int = 9, indent: Int = 3)

  def apply(tableName: String, fields: Seq[FieldRepr],
            opts: Options = Options(), echo: Boolean = true): String = {
    val sb = new StringBuilder
    sb.append(tableName).append('\n')
    sb.append("─" * (opts.nameWidth + opts.typeWidth + opts.modeWidth + 2)).append('\n')
    renderFields(sb, fields, prefix = "", opts)
    val out = sb.result()
    if (echo) print(out)
    out
  }

  /** The reference's own rendering template, verbatim
    * (`bigquery/schema.py:355-434` with its docstring defaults): name /
    * type / mode columns at widths 60/30/10, indent 2, `├── ` leaf
    * branches, `├─┬ ` record branches, `│ ` guide rails, and the name
    * column narrowing by the indent at each nesting level. Golden-pinned
    * against the reference's rendered `Erco_articles` docstring tree
    * (schema.py:322-349) in GoldenFixturesSpec.
    */
  def referenceTree(title: String, fields: Seq[FieldRepr],
                    nameWidth: Int = 60, typeWidth: Int = 30,
                    modeWidth: Int = 10, indent: Int = 2,
                    echo: Boolean = true): String = {
    val sb = new StringBuilder
    sb.append(title).append('\n')
    def render(fs: Seq[FieldRepr], layers: Seq[Boolean], nw: Int): Unit = {
      val rail = layers.map(l =>
        (if (l) "│" else " ") + (" " * math.max(0, indent - 1))).mkString
      fs.zipWithIndex.foreach { case (f, i) =>
        val last = i == fs.size - 1
        val branch = if (last) "└" else "├"
        val isRecord = f.fields.nonEmpty
        val stem =
          if (isRecord) ("─" * math.max(0, indent - 1)) + "┬ "
          else ("─" * math.max(1, indent)) + " "
        sb.append(rail).append(branch).append(stem)
          .append(padTo(f.name, nw)).append(padTo(f.fieldType, typeWidth))
          .append(padTo(f.mode, modeWidth)).append('\n')
        if (isRecord) render(f.fields, layers :+ !last, nw - indent)
      }
    }
    render(fields, Seq.empty, nameWidth)
    val out = sb.result()
    if (echo) print(out)
    out
  }

  /** Python `f"{s:<w}"` semantics: pad to `w`, never add past-width
    * slack (unlike [[pad]], which guarantees one separator space).
    */
  private def padTo(s: String, w: Int): String =
    if (s.length >= w) s else s + (" " * (w - s.length))

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
