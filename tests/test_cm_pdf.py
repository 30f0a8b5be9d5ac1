"""S7 PDF confusion-matrix sink (ml/cm_pdf.py): structural PDF
assertions (header, xref offsets, trailer) + end-to-end Spark render
— the zero-dep twin of the reference's matplotlib savefig
(confusionmatrix.py:100-144)."""

import re

import pyspark.sql.functions as F

from demv_spark.ml.cm_pdf import render_confusion_matrix_pdf, write_confusion_matrix_pdf


def test_render_pdf_structure():
    pdf = render_confusion_matrix_pdf(
        [[0.8, 0.2], [0.3, 0.7]], [[0.6, 0.4], [0.1, 0.9]], ["neg", "pos"]
    )
    assert pdf.startswith(b"%PDF-1.4")
    assert pdf.rstrip().endswith(b"%%EOF")
    assert b"(Unprivileged group)" in pdf and b"(Privileged group)" in pdf
    assert b"(0.80)" in pdf and b"(0.90)" in pdf
    # xref offsets actually point at their objects
    xref_at = int(re.search(rb"startxref\n(\d+)", pdf).group(1))
    assert pdf[xref_at:xref_at + 4] == b"xref"
    for m in re.finditer(rb"(\d{10}) 00000 n", pdf):
        off = int(m.group(1))
        assert re.match(rb"\d+ 0 obj", pdf[off:off + 12])


def test_render_pdf_escapes_parens():
    pdf = render_confusion_matrix_pdf([[1.0]], [[1.0]], ["a(b)"])
    assert rb"(a\(b\))" in pdf


def test_write_confusion_matrix_pdf_end_to_end(spark, tmp_path):
    df = spark.createDataFrame(
        [(g, t, p) for g in (0, 1) for t in ("a", "b") for p in ("a", "b")] * 5,
        ["g", "y_true", "y_pred"],
    )
    out = str(tmp_path / "cm.pdf")
    classes = write_confusion_matrix_pdf(df, F.col("g") == 1, "y_true", "y_pred", out)
    assert classes == ["a", "b"]
    data = open(out, "rb").read()
    assert data.startswith(b"%PDF") and b"(0.50)" in data
