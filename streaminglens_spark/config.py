"""Engine configuration: the reference's 15 options with identical keys,
defaults and validation rules (reference ``config/StreamingLensConfig.scala:25-105``).

Keys are case-insensitive (the reference wraps options in
``CaseInsensitiveMap``); doubles must lie in (0, 1); ints/longs must be > 0;
booleans must parse.
"""

from __future__ import annotations


class StreamingLensConfig:
    """Validated options bag (U5).

    >>> StreamingLensConfig({"streamingLens.minBatches": "2"}).min_batches
    2
    """

    def __init__(self, parameters: dict[str, str] | None = None):
        p = {k.lower(): v for k, v in (parameters or {}).items()}
        self._p = p

        self.analysis_interval_minutes = self._int(p, "streamingLens.analysisIntervalMinutes", 5)
        self.lagging_threshold = self._double(
            p, "streamingLens.criticalPathAnalysis.overProvisionPercentage", 0.3
        )
        self.okay_threshold = self._double(
            p, "streamingLens.criticalPathAnalysis.underProvisionPercentage", 0.7
        )
        self.critical_path_threshold = self._double(
            p, "streamingLens.criticalPathAnalysis.criticalPathPercentage", 0.7
        )
        self.min_batches = self._int(p, "streamingLens.minBatches", 1)
        self.max_results_retention = self._int(p, "streamingLens.maxResultsRetention", 30)
        self.max_batches_retention = self._int(p, "streamingLens.maxBatchesRetention", 10)
        self.max_analysis_time_seconds = self._int(p, "streamingLens.maxAnalysisTimeSeconds", 5)
        self.max_retries = self._int(p, "streamingLens.maxRetries", 3)
        self.should_log_results = self._bool(p, "streamingLens.shouldLogResults", True)
        self.enable_reporting = self._bool(p, "streamingLens.reporter.enabled", False)
        self.expected_micro_batch_sla_millis = self._long(
            p, "streamingLens.expectedMicroBatchSLAMillis", 1000 * 60 * 2
        )
        self.reporter_class_name = p.get(
            "streaminglens.reporter.classname", "JsonFileReporter"
        )
        self.discount_factor = self._double(p, "streamingLens.reporter.discountFactor", 0.95)
        self.reporting_interval_minutes = self._int(p, "streamingLens.reporter.intervalMinutes", 60)
        # options forwarded to the pluggable reporter (U1); key-substring
        # filter as in the reference (StreamingLensConfig.scala:64-65)
        self.reporting_options = {
            k: v for k, v in p.items() if "streaminglens.reporter" in k
        }

    @staticmethod
    def _double(p: dict, name: str, default: float) -> float:
        raw = p.get(name.lower())
        if raw is None:
            return default
        try:
            v = float(raw)
        except ValueError:
            v = None
        if v is None or not (0 < v < 1):
            raise ValueError(
                f"Invalid value '{raw}' for option '{name}', must be between 0 and 1"
            )
        return v

    @staticmethod
    def _int(p: dict, name: str, default: int) -> int:
        raw = p.get(name.lower())
        if raw is None:
            return default
        try:
            v = int(raw)
        except ValueError:
            v = None
        if v is None or v <= 0:
            raise ValueError(
                f"Invalid value '{raw}' for option '{name}', must be a positive integer"
            )
        return v

    _long = _int

    @staticmethod
    def _bool(p: dict, name: str, default: bool) -> bool:
        raw = p.get(name.lower())
        if raw is None:
            return default
        if raw.lower() in ("true", "false"):
            return raw.lower() == "true"
        raise ValueError(f"Invalid value '{raw}' for option '{name}', must be true or false")
