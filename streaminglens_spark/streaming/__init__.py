"""Live-mode surface: listeners, analyzer, reporters, telemetry providers,
stateful streaming operators."""

from .annmaint import (
    AnnMaintenanceState,
    PqMaintenanceState,
    RefitMaintenanceState,
    ann_maintenance_monitor,
    ann_maintenance_monitor_with_refit,
    pq_maintenance_monitor,
    restore_ann_state,
    restore_pq_state,
    restore_refit_state,
)
from .budget import (
    BudgetAdmissionState,
    MixtureBudgetState,
    budget_admission_monitor,
    mixture_admission_monitor,
    restore_budget_state,
    restore_mixture_state,
    temperature_targets,
)
from .dedup import loser_ids_of_batch, near_dedup_stream
from .ingest import corpus_ingest_monitor, restore_ingest_state
from .lines import dedup_lines_of_batch, line_dedup_monitor
from .split import assign_splits_of_batch, split_assignment_monitor
from .live import LiveAnalyzer, ProgressCapture, attach, detach, foreach_batch_monitor
from .reporters import (
    JsonFileReporter,
    LoggingGaugeSink,
    StreamingLensEventsReporterInterface,
    load_reporter,
)
from .scheduler import (
    SchedulerCapture,
    attach_scheduler,
    detach_scheduler,
    scheduler_telemetry_provider,
)
from .stateful import discounted_health_stream
from .statusapi import StatusApiPoller, status_api_telemetry_provider

__all__ = [
    "AnnMaintenanceState",
    "PqMaintenanceState",
    "RefitMaintenanceState",
    "JsonFileReporter",
    "LiveAnalyzer",
    "LoggingGaugeSink",
    "ProgressCapture",
    "SchedulerCapture",
    "StatusApiPoller",
    "StreamingLensEventsReporterInterface",
    "attach",
    "attach_scheduler",
    "detach",
    "detach_scheduler",
    "ann_maintenance_monitor",
    "ann_maintenance_monitor_with_refit",
    "pq_maintenance_monitor",
    "restore_ann_state",
    "restore_pq_state",
    "restore_refit_state",
    "BudgetAdmissionState",
    "budget_admission_monitor",
    "MixtureBudgetState",
    "mixture_admission_monitor",
    "restore_mixture_state",
    "temperature_targets",
    "restore_budget_state",
    "corpus_ingest_monitor",
    "assign_splits_of_batch",
    "dedup_lines_of_batch",
    "line_dedup_monitor",
    "split_assignment_monitor",
    "restore_ingest_state",
    "discounted_health_stream",
    "foreach_batch_monitor",
    "load_reporter",
    "loser_ids_of_batch",
    "near_dedup_stream",
    "scheduler_telemetry_provider",
    "status_api_telemetry_provider",
]
