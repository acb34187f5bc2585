/* Live refresh for the dashboard — parity role of the reference's Vue app
   (backend/static/js + templates/dashboard.html): polls the JSON endpoints
   and re-renders the task table / log tail in place. */
"use strict";

function pollTaskTable(table) {
  const url = table.dataset.poll;
  async function tick() {
    try {
      const res = await fetch(url, { headers: { Accept: "application/json" } });
      if (!res.ok) return;
      const data = await res.json();
      const body = table.querySelector("tbody");
      if (!body || !data.tasks) return;
      body.innerHTML = "";
      for (const t of data.tasks) {
        const tr = document.createElement("tr");
        const state = (t.state || "").toLowerCase();
        tr.innerHTML =
          `<td class="mono"></td><td></td>` +
          `<td><span class="state state-${state}"></span></td><td></td>`;
        tr.children[0].textContent = t.id || "";
        tr.children[1].textContent = t.algorithm || "";
        tr.children[2].firstChild.textContent = t.state || "";
        tr.children[3].textContent = t.error || "";
        body.appendChild(tr);
      }
    } catch (err) {
      /* transient network errors: keep the last rendering */
    }
  }
  tick();
  setInterval(tick, 4000);
}

function pollLogTail(pre) {
  const url = pre.dataset.poll;
  async function tick() {
    try {
      const res = await fetch(url, { headers: { Accept: "application/json" } });
      if (!res.ok) return;
      const data = await res.json();
      if (data.log) pre.textContent = data.log.join("\n");
    } catch (err) {
      /* keep last tail */
    }
  }
  tick();
  setInterval(tick, 4000);
}

document.addEventListener("DOMContentLoaded", () => {
  const table = document.getElementById("task-table");
  if (table) pollTaskTable(table);
  const pre = document.getElementById("log-tail");
  if (pre) pollLogTail(pre);
});
