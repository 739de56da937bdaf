from .inspect import executed_plan, plan_report, scan_summary

__all__ = ["executed_plan", "plan_report", "scan_summary"]
