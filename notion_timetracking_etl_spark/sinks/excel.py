"""Excel sink (SURVEY S7).

Workbook semantics (reference: src/sinks/excel/index.ts:9-69): one worksheet
per table in sorted name order (:13); header row = first row's keys (:31-36);
header styled bold on a light-gray fill (:38-43); null → '' coercion (:49-56);
minimum column width 15 (:61-65); empty tables still get a (blank) sheet.

The sheet model is built as plain Python (testable without any Excel
library). The ``.xlsx`` encoding prefers ``openpyxl`` when present; absent
that (this container), a minimal pure-Python OOXML writer (ECMA-376
SpreadsheetML: a zip of XML parts with inline strings) produces a real,
openable workbook with the same header styling and column widths — round-
tripped in tests through zipfile + ElementTree. Rows stream off the
executors via ``toLocalIterator`` (Excel is a small-output sink; a 100 TB
result does not belong in a workbook, the driver never holds more than one
partition).
"""

from __future__ import annotations

from dataclasses import dataclass
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame

HEADER_FILL_RGB = "E0E0E0"
MIN_COLUMN_WIDTH = 15


@dataclass
class SheetModel:
    name: str
    header: list[str]
    rows: list[list[object]]  # nulls already coerced to ''


def build_sheet_model(name: str, df: DataFrame) -> SheetModel:
    header = list(df.columns)
    rows = [
        ["" if row[c] is None else row[c] for c in header]
        for row in df.toLocalIterator()
    ]
    return SheetModel(name=name, header=header, rows=rows)


def build_workbook_model(tables: dict[str, DataFrame]) -> list[SheetModel]:
    """Sheets in sorted table-name order; empty tables keep an empty sheet."""
    return [build_sheet_model(name, tables[name]) for name in sorted(tables)]


def column_letter(idx: int) -> str:
    """1-based column index -> spreadsheet letters (1=A, 27=AA)."""
    out = ""
    while idx > 0:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _sheet_xml(sheet: SheetModel) -> str:
    """One worksheet part. Header cells use style 1 (bold on the gray fill);
    numbers (non-bool int/float) are numeric cells, everything else inline
    strings — matching the openpyxl path's effective cell types."""
    parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>']
    parts.append(
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main">'
    )
    if sheet.rows:
        parts.append(
            f'<cols><col min="1" max="{len(sheet.header)}" '
            f'width="{MIN_COLUMN_WIDTH}" customWidth="1"/></cols>'
        )
        parts.append("<sheetData>")
        header_cells = "".join(
            f'<c r="{column_letter(i + 1)}1" t="inlineStr" s="1">'
            f"<is><t>{escape(str(h))}</t></is></c>"
            for i, h in enumerate(sheet.header)
        )
        parts.append(f'<row r="1">{header_cells}</row>')
        for rn, row in enumerate(sheet.rows, start=2):
            cells = []
            for i, v in enumerate(row):
                ref = f"{column_letter(i + 1)}{rn}"
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    cells.append(f'<c r="{ref}"><v>{v!r}</v></c>')
                else:
                    cells.append(
                        f'<c r="{ref}" t="inlineStr">'
                        f"<is><t>{escape(str(v))}</t></is></c>"
                    )
            parts.append(f'<row r="{rn}">{"".join(cells)}</row>')
        parts.append("</sheetData>")
    else:
        parts.append("<sheetData/>")
    parts.append("</worksheet>")
    return "".join(parts)


_STYLES_XML = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="2"><font/><font><b/></font></fonts>
<fills count="3"><fill><patternFill patternType="none"/></fill>
<fill><patternFill patternType="gray125"/></fill>
<fill><patternFill patternType="solid">
<fgColor rgb="FF{HEADER_FILL_RGB}"/></patternFill></fill></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf/></cellStyleXfs>
<cellXfs count="2"><xf/>
<xf fontId="1" fillId="2" applyFont="1" applyFill="1"/></cellXfs>
</styleSheet>"""


def _write_xlsx_minimal(sheets: list[SheetModel], output_path: str) -> None:
    """Dependency-free .xlsx writer: the minimal valid SpreadsheetML package
    (content types, package/workbook rels, styles, one worksheet part per
    sheet). Inline strings keep it single-pass — no shared-string table."""
    import zipfile

    ct = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">',
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>',
        '<Default Extension="xml" ContentType="application/xml"/>',
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>',
        '<Override PartName="/xl/styles.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.styles+xml"/>',
    ]
    for i in range(len(sheets)):
        ct.append(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
        )
    ct.append("</Types>")

    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    wb_sheets = "".join(
        f'<sheet name="{escape(s.name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, s in enumerate(sheets)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        '2006/main" xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">',
    ]
    for i in range(len(sheets)):
        wb_rels.append(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
        )
    wb_rels.append(
        f'<Relationship Id="rId{len(sheets) + 1}" Type="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships/styles" '
        'Target="styles.xml"/>'
    )
    wb_rels.append("</Relationships>")

    with zipfile.ZipFile(output_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", "".join(ct))
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", "".join(wb_rels))
        zf.writestr("xl/styles.xml", _STYLES_XML)
        for i, sheet in enumerate(sheets):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(sheet))


def write_excel(tables: dict[str, DataFrame], output_path: str) -> list[SheetModel]:
    """Write an .xlsx workbook; returns the sheet models written."""
    sheets = build_workbook_model(tables)
    try:
        import openpyxl
        from openpyxl.styles import Font, PatternFill
    except ImportError:
        _write_xlsx_minimal(sheets, output_path)
        return sheets

    wb = openpyxl.Workbook()
    wb.remove(wb.active)
    fill = PatternFill(start_color=HEADER_FILL_RGB, end_color=HEADER_FILL_RGB, fill_type="solid")
    for sheet in sheets:
        ws = wb.create_sheet(sheet.name)
        if not sheet.rows:
            continue
        ws.append(sheet.header)
        for cell in ws[1]:
            cell.font = Font(bold=True)
            cell.fill = fill
        for row in sheet.rows:
            ws.append(row)
        for idx, col_name in enumerate(sheet.header, start=1):
            letter = ws.cell(row=1, column=idx).column_letter
            ws.column_dimensions[letter].width = max(
                ws.column_dimensions[letter].width or 10, MIN_COLUMN_WIDTH
            )
    wb.save(output_path)
    return sheets
