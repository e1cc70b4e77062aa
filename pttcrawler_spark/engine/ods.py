"""Minimal OpenDocument-Spreadsheet (.ods) writer — the S11 sink.

The reference exports one .ods holding all three report sheets via
pyexcel-ods (`/root/reference/export.py:287-296`, sheet order Article /
Push / User from `_get_export_rows`, `export.py:216-264`). pyexcel isn't in
this container, and an OLAP engine shouldn't need it: an .ods file is a zip
archive with a fixed `mimetype` member, a manifest, and a single
`content.xml` whose body is one `<table:table>` per sheet with
string/float-typed cells. That subset (exactly what pyexcel-ods emits for a
list-of-rows payload) is implemented here on the stdlib only.

Scale shape: a report file is inherently a single-writer artifact (same as
the reference's one-file output), so rows are STREAMED through the driver
with `toLocalIterator()` — one partition in memory at a time, ordered by the
sheet's export ordering — and written incrementally into the zip. Nothing is
collect()ed, and the upstream sheet plans (engine/export.py) stay fully
distributed; only the final serialization is sequential, as it must be.

Reading .ods back (tests, and users who want to verify an export) is
`read_ods`, an elementtree parse of the same subset, honouring
`table:number-columns-repeated` the way LibreOffice emits trailing blanks.
"""

from __future__ import annotations

import zipfile
from typing import Iterable, Iterator
from xml.sax.saxutils import escape

MIMETYPE = "application/vnd.oasis.opendocument.spreadsheet"

_MANIFEST = """<?xml version="1.0" encoding="UTF-8"?>
<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0" manifest:version="1.2">
 <manifest:file-entry manifest:full-path="/" manifest:media-type="{mime}"/>
 <manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>
</manifest:manifest>
""".format(mime=MIMETYPE)

_CONTENT_HEAD = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<office:document-content'
    ' xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
    ' xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"'
    ' xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"'
    ' office:version="1.2">\n'
    ' <office:body><office:spreadsheet>\n')
_CONTENT_TAIL = " </office:spreadsheet></office:body>\n</office:document-content>\n"


def _cell_xml(v) -> str:
    """One table:table-cell. Numbers get office:value (what pyexcel-ods does
    for int/float rows); everything else is a string cell."""
    if v is None:
        return "<table:table-cell/>"
    if isinstance(v, bool):  # bool is an int subclass — keep it textual
        v = str(v)
    if isinstance(v, (int, float)):
        num = repr(v) if isinstance(v, float) else str(v)
        return (f'<table:table-cell office:value-type="float"'
                f' office:value="{num}"><text:p>{escape(num)}</text:p>'
                f"</table:table-cell>")
    return (f'<table:table-cell office:value-type="string">'
            f"<text:p>{escape(str(v))}</text:p></table:table-cell>")


def _row_xml(row: Iterable) -> str:
    cells = "".join(_cell_xml(v) for v in row)
    return f"  <table:table-row>{cells}</table:table-row>\n"


def write_ods(path: str, sheets: dict[str, Iterator[Iterable]]) -> None:
    """Write ``{sheet_name: iterator-of-rows}`` to ``path``.

    Rows are consumed lazily (pass ``df.toLocalIterator()``); each row is any
    iterable of cell values. Sheet order = dict order (the reference's
    OrderedDict Article/Push/User, export.py:219)."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        # the ODF spec requires `mimetype` first and STORED (uncompressed)
        zf.writestr(zipfile.ZipInfo("mimetype"), MIMETYPE,
                    compress_type=zipfile.ZIP_STORED)
        zf.writestr("META-INF/manifest.xml", _MANIFEST)
        with zf.open("content.xml", "w") as fh:
            fh.write(_CONTENT_HEAD.encode())
            for name, rows in sheets.items():
                fh.write(f' <table:table table:name="{escape(name)}">\n'
                         .encode())
                for row in rows:
                    fh.write(_row_xml(row).encode())
                fh.write(b" </table:table>\n")
            fh.write(_CONTENT_TAIL.encode())


def read_ods(path: str) -> dict[str, list[list]]:
    """Parse the subset written above (plus LibreOffice's repeated-columns
    attribute) back to ``{sheet: rows}``; float cells come back as float."""
    import xml.etree.ElementTree as ET

    ns = {
        "office": "urn:oasis:names:tc:opendocument:xmlns:office:1.0",
        "table": "urn:oasis:names:tc:opendocument:xmlns:table:1.0",
        "text": "urn:oasis:names:tc:opendocument:xmlns:text:1.0",
    }
    with zipfile.ZipFile(path) as zf:
        if zf.read("mimetype").decode() != MIMETYPE:
            raise ValueError(f"{path} is not an ODS file")
        root = ET.fromstring(zf.read("content.xml"))
    out: dict[str, list[list]] = {}
    for tbl in root.iter(f"{{{ns['table']}}}table"):
        rows = []
        for tr in tbl.iter(f"{{{ns['table']}}}table-row"):
            row: list = []
            for tc in tr.iter(f"{{{ns['table']}}}table-cell"):
                reps = int(tc.get(f"{{{ns['table']}}}number-columns-repeated",
                                  "1"))
                vtype = tc.get(f"{{{ns['office']}}}value-type")
                if vtype == "float":
                    val: object = float(tc.get(f"{{{ns['office']}}}value"))
                else:
                    val = "".join(p.text or ""
                                  for p in tc.iter(f"{{{ns['text']}}}p"))
                row.extend([val] * reps)
            rows.append(row)
        out[tbl.get(f"{{{ns['table']}}}name")] = rows
    return out
