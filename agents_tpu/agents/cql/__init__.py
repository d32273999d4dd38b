from agents_tpu.agents.cql.cql_sac_agent import CqlSacAgent

__all__ = ["CqlSacAgent"]
