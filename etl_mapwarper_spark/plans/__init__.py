from .audit import PlanAudit, audit, formatted_plan

__all__ = ["PlanAudit", "audit", "formatted_plan"]
