"""
N2O concentration chemistry with concentration-dependent stratospheric
lifetime and a lagged-burden sink.

Mirror of ``crates/rscm-magicc/src/chemistry/n2o.rs:78-219`` +
``src/parameters/n2o_chemistry.rs``.
"""

from __future__ import annotations

from rscm_tpu.components._builder import make_builder
from rscm_tpu.core import xmath as xm
from rscm_tpu.core.component import Component, Input, Output, Parameter, State

__all__ = ["N2OChemistry", "N2OChemistryBuilder"]

PRATHER_ITERATIONS = 4


class N2OChemistry(Component):
    """N2O concentration with lifetime feedback."""

    tags = ("chemistry", "n2o", "magicc")
    category = "Atmospheric Chemistry"

    n2o_emissions = Input("Emissions|N2O", unit="Mt N/yr")
    n2o_concentration = State("Atmospheric Concentration|N2O", unit="ppb")
    n2o_lifetime = Output("Lifetime|N2O", unit="yr")

    n2o_pi = Parameter(default=270.0, unit="ppb")
    natural_emissions = Parameter(default=11.0, unit="Mt N/yr")
    tau_n2o = Parameter(default=139.275, unit="yr")
    lifetime_feedback = Parameter(default=-0.04)
    strat_delay = Parameter(default=1, static=True)
    ppb_to_tg = Parameter(default=4.79, unit="Tg/ppb")

    def input_lookback(self, var_name: str) -> int:
        # the lagged-burden sink reads at_offset(-(strat_delay + 1))
        if var_name == "Atmospheric Concentration|N2O":
            return max(int(self.strat_delay), 1) + 1
        return super().input_lookback(var_name)

    def calculate_effective_lifetime(self, burden_mid, burden_reference):
        ratio = xm.maximum(burden_mid / burden_reference, 1.0)
        return self.tau_n2o * ratio**self.lifetime_feedback

    def solve_concentration(self, n2o_prev, n2o_current, n2o_lagged, emissions, dt):
        total_emissions = emissions + self.natural_emissions
        burden_prev = n2o_prev * self.ppb_to_tg
        burden_lagged = n2o_lagged * self.ppb_to_tg
        burden_reference = self.n2o_pi * self.ppb_to_tg

        burden = n2o_current * self.ppb_to_tg
        tau_eff = self.tau_n2o
        for _ in range(PRATHER_ITERATIONS):
            burden_mid = (burden_prev + burden) / 2.0
            tau_eff = self.calculate_effective_lifetime(burden_mid, burden_reference)
            delta_burden = (total_emissions - burden_lagged / tau_eff) * dt
            burden = burden_prev + delta_burden

        return burden / self.ppb_to_tg, tau_eff

    def solve_ctx(self, ctx, inputs, internal_state):
        dt = ctx.t_next - ctx.t_current

        n2o_current = inputs.n2o_concentration.at_start()
        n2o_prev = inputs.n2o_concentration.previous()
        if n2o_prev is None:
            n2o_prev = n2o_current

        delay = max(int(self.strat_delay), 1)
        t_delay = inputs.n2o_concentration.at_offset(-delay)
        if t_delay is None:
            t_delay = n2o_prev
        t_delay_minus1 = inputs.n2o_concentration.at_offset(-(delay + 1))
        if t_delay_minus1 is None:
            t_delay_minus1 = t_delay
        n2o_lagged = (t_delay + t_delay_minus1) / 2.0

        new_concentration, lifetime = self.solve_concentration(
            n2o_prev, n2o_current, n2o_lagged, inputs.n2o_emissions.get(), dt
        )
        return (
            self.Outputs(n2o_concentration=new_concentration, n2o_lifetime=lifetime),
            internal_state,
        )


N2OChemistryBuilder = make_builder(N2OChemistry)
