"""
CH4 concentration chemistry with OH lifetime feedbacks.

Mirror of ``crates/rscm-magicc/src/chemistry/ch4.rs:75-307`` +
``src/parameters/ch4_chemistry.rs`` (MAGICC7 defaults): Prather-style
iterative burden update (4 iterations) with CH4 self-feedback on OH,
NOx/CO/NMVOC emission feedbacks, temperature feedback, and fixed
soil/stratospheric/tropospheric-Cl sinks.
"""

from __future__ import annotations

from rscm_tpu.components._builder import make_builder
from rscm_tpu.core import xmath as xm
from rscm_tpu.core.component import Component, Input, Output, Parameter, State

__all__ = ["CH4Chemistry", "CH4ChemistryBuilder"]

PRATHER_ITERATIONS = 4


class CH4Chemistry(Component):
    """CH4 concentration with interactive OH lifetime."""

    tags = ("chemistry", "ch4", "magicc")
    category = "Atmospheric Chemistry"

    ch4_emissions = Input("Emissions|CH4", unit="Mt CH4/yr")
    temperature = Input("Surface Temperature", unit="K")
    nox_emissions = Input("Emissions|NOx", unit="Mt N/yr")
    co_emissions = Input("Emissions|CO", unit="Mt CO/yr")
    nmvoc_emissions = Input("Emissions|NMVOC", unit="Mt NMVOC/yr")
    ch4_concentration = State("Atmospheric Concentration|CH4", unit="ppb")
    ch4_lifetime = Output("Lifetime|CH4", unit="yr")

    ch4_pi = Parameter(default=722.0, unit="ppb")
    natural_emissions = Parameter(default=209.0, unit="Mt CH4/yr")
    tau_oh = Parameter(default=9.3, unit="yr")
    tau_soil = Parameter(default=150.0, unit="yr")
    tau_strat = Parameter(default=120.0, unit="yr")
    tau_trop_cl = Parameter(default=200.0, unit="yr")
    ch4_self_feedback = Parameter(default=-0.32)
    oh_sensitivity_scale = Parameter(default=0.72)
    oh_nox_sensitivity = Parameter(default=0.0042)
    oh_co_sensitivity = Parameter(default=-0.000105)
    oh_nmvoc_sensitivity = Parameter(default=-0.000315)
    temp_sensitivity = Parameter(default=0.0316)
    include_temp_feedback = Parameter(default=True, static=True)
    include_emissions_feedback = Parameter(default=True, static=True)
    ppb_to_tg = Parameter(default=2.75, unit="Tg/ppb")
    nox_reference = Parameter(default=0.0)
    co_reference = Parameter(default=0.0)
    nmvoc_reference = Parameter(default=0.0)

    # -- lifetime pieces (ch4.rs:49-122) ------------------------------------

    def tau_other(self):
        return 1.0 / (1.0 / self.tau_soil + 1.0 / self.tau_strat + 1.0 / self.tau_trop_cl)

    def _base_lifetime_factor(self, delta_nox, delta_co, delta_nmvoc):
        if not self.include_emissions_feedback:
            return self.tau_oh
        gamma = self.oh_sensitivity_scale
        exponent = -gamma * (
            self.oh_nox_sensitivity * delta_nox
            + self.oh_co_sensitivity * delta_co
            + self.oh_nmvoc_sensitivity * delta_nmvoc
        )
        return self.tau_oh * xm.exp(exponent)

    def _oh_lifetime(self, burden_mean, burden_reference, base_lifetime_factor):
        x = -self.oh_sensitivity_scale * self.ch4_self_feedback
        ratio = xm.maximum(burden_mean / burden_reference, 1.0)
        return base_lifetime_factor * ratio**x

    def _apply_temperature_feedback(self, tau_oh, temperature):
        if not self.include_temp_feedback:
            return tau_oh
        delta_t = xm.maximum(temperature, 0.0)
        adjusted = self.tau_oh / (
            self.tau_oh / tau_oh + self.temp_sensitivity * delta_t
        )
        return xm.where(xm.abs(temperature) < 1e-10, tau_oh, adjusted)

    def _iteration_correction(self, tau_oh, delta_burden_prev, burden_current):
        x = -self.oh_sensitivity_scale * self.ch4_self_feedback
        corrected = tau_oh * (1.0 - 0.5 * x * delta_burden_prev / burden_current)
        return xm.where(xm.abs(burden_current) < 1e-10, tau_oh, corrected)

    def calculate_total_lifetime(self, tau_oh):
        return 1.0 / (1.0 / tau_oh + 1.0 / self.tau_other())

    # -- solve (ch4.rs:126-205) ----------------------------------------------

    def solve_concentration(
        self, ch4_prev, ch4_current, anthropogenic_emissions, temperature,
        nox_emissions, co_emissions, nmvoc_emissions,
    ):
        total_emissions = anthropogenic_emissions + self.natural_emissions
        burden_prev = ch4_prev * self.ppb_to_tg
        burden_reference = self.ch4_pi * self.ppb_to_tg

        base_lifetime_factor = self._base_lifetime_factor(
            nox_emissions - self.nox_reference,
            co_emissions - self.co_reference,
            nmvoc_emissions - self.nmvoc_reference,
        )

        burden = ch4_current * self.ppb_to_tg
        delta_burden = None
        tau_oh = self.tau_oh
        tau_other = self.tau_other()

        for _ in range(PRATHER_ITERATIONS):
            burden_mean = (burden + burden_prev) / 2.0
            tau_oh = self._oh_lifetime(burden_mean, burden_reference, base_lifetime_factor)
            if delta_burden is not None:
                tau_oh = self._iteration_correction(tau_oh, delta_burden, burden_prev)
            tau_oh = self._apply_temperature_feedback(tau_oh, temperature)
            delta_burden = (
                total_emissions - burden_mean / tau_oh - burden_mean / tau_other
            )
            burden = burden_prev + delta_burden

        new_concentration = burden / self.ppb_to_tg
        total_lifetime = self.calculate_total_lifetime(tau_oh)
        return new_concentration, total_lifetime

    def solve_ctx(self, ctx, inputs, internal_state):
        ch4_current = inputs.ch4_concentration.at_start()
        ch4_prev = inputs.ch4_concentration.previous()
        if ch4_prev is None:
            ch4_prev = ch4_current

        new_concentration, lifetime = self.solve_concentration(
            ch4_prev,
            ch4_current,
            inputs.ch4_emissions.get(),
            inputs.temperature.get(),
            inputs.nox_emissions.get(),
            inputs.co_emissions.get(),
            inputs.nmvoc_emissions.get(),
        )
        return (
            self.Outputs(ch4_concentration=new_concentration, ch4_lifetime=lifetime),
            internal_state,
        )


CH4ChemistryBuilder = make_builder(CH4Chemistry)
