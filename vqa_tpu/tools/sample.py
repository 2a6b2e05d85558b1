"""Qualitative VQA sampling: print one Q/A prediction per batch + histogram.

Rewrite of `/root/reference/sample.py` (marked "TODO: need to rewrite" and
broken — it calls ``.argmax`` on the model's output *tuple*, sample.py:18-19;
SURVEY.md section 2.1 defect 5). Same output format, working implementation
over the jitted inference path.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from vqa_tpu.training.state import make_infer_step
from vqa_tpu.training.train import model_batch


def sample_vqa(model, params, dataloader, ans_list: List[str],
               logger=None, sample: int = 0) -> Dict[str, int]:
    """Print/log the first prediction of each batch; return answer histogram."""
    infer = make_infer_step(model)
    count = np.zeros(len(ans_list), np.int64)
    for i, batch in enumerate(dataloader):
        if i == sample and sample != 0:
            break
        nvalid = int(batch.pop("nvalid"))
        ids = batch["id"]
        target = np.asarray(batch["a"])
        predict = np.asarray(infer(params, model_batch(batch)))[:nvalid]
        labels = predict.argmax(1)

        index = int(ids[0])
        answer = int(labels[0])
        result = (str(index).zfill(12)
                  + " | Q: " + dataloader.dataset.questions[index].get("q_word", "")
                  + "? | A: " + ans_list[answer]
                  + f" (score: {target[0, answer]:.2f})")
        if logger is not None:
            logger.write(result)

        np.add.at(count, labels, 1)

    return {ans_list[i]: int(count[i]) for i in np.nonzero(count)[0]}
