"""Excel sink (SURVEY S7).

Workbook semantics (reference: src/sinks/excel/index.ts:9-69): one worksheet
per table in sorted name order (:13); header row = first row's keys (:31-36);
header styled bold on a light-gray fill (:38-43); null → '' coercion (:49-56);
minimum column width 15 (:61-65); empty tables still get a (blank) sheet.

The sheet model is built as plain Python (testable without any Excel library);
the actual ``.xlsx`` encoding needs ``openpyxl``, which this container lacks —
the writer raises a clear error if it's absent. Rows stream off the executors
via ``toLocalIterator`` (Excel is a small-output sink; a 100 TB result does
not belong in a workbook, the driver never holds more than one partition).
"""

from __future__ import annotations

from dataclasses import dataclass

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


def write_excel(tables: dict[str, DataFrame], output_path: str) -> list[SheetModel]:
    """Write an .xlsx workbook; returns the sheet models written."""
    sheets = build_workbook_model(tables)
    try:
        import openpyxl
        from openpyxl.styles import Font, PatternFill
    except ImportError as exc:  # pragma: no cover — container has no openpyxl
        raise NotImplementedError(
            "Excel output requires openpyxl, which is not installed in this "
            "environment; build_workbook_model() provides the full sheet "
            "content for any writer"
        ) from exc

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
