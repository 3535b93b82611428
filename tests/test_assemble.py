"""Grouped-map conversation assembly (ocr_spark/operators/assemble.py)."""

import pandas as pd

from ocr_spark.operators.assemble import assemble_conversations


def test_assembly_order_and_empties(spark):
    pdf = pd.DataFrame(
        {
            "conv_id": ["b", "a", "a", "b", "a"],
            "turn_idx": [1, 2, 0, 0, 1],
            "extracted_text": ["B1", "A2", "A0", "B0", ""],
        }
    )
    out = {
        r.conv_id: r
        for r in assemble_conversations(
            spark.createDataFrame(pdf).repartition(5)
        ).collect()
    }
    # turn order restored inside each group regardless of arrival order;
    # the empty turn keeps its slot (separators preserved)
    assert out["a"].doc_text == "A0" + "\n\n" + "" + "\n\n" + "A2"
    assert out["a"].n_turns == 3
    assert out["b"].doc_text == "B0\n\nB1"
    assert out["b"].n_turns == 2
