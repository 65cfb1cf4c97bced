"""Reusable DataFrame-level operators (the engine's library surface).

Everything here is built from JVM-side expressions — no Python UDFs in any
hot path — so plans stay inside whole-stage codegen and scale with executors.
"""
