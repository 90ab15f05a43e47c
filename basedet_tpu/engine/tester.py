"""BaseTester: evaluation-loop façade (API parity with basecore's
BaseTester used by the reference, engine/__init__.py:4 + det_test.py:74-75).
"""
from __future__ import annotations

from basedet_tpu.utils import logger


class BaseTester:
    def __init__(self, model, dataloader, evaluator, variables=None):
        self.model = model
        self.dataloader = dataloader
        self.evaluator = evaluator
        self.variables = variables

    def test(self, variables=None):
        variables = variables if variables is not None else self.variables
        assert variables is not None, "provide model variables to test()"
        results = self.evaluator.evaluate_model(
            self.model, variables, self.dataloader
        )
        logger.info(f"test results: {results}")
        return results
